package graft

import graft.Materialize.CheckpointOps
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

/** The cluster-durability switch (Materialize.checkpointed).
  *
  * Default (conf unset) must be byte-identical to localCheckpoint —
  * that is what every CORRECTNESS hash was recorded against. With
  * `spark.graft.checkpointDir` set, the same call sites must produce a
  * reliable checkpoint: lineage truncated AND rdd blocks written into
  * the configured fault-tolerant directory (what survives executor
  * loss on a real cluster). */
class MaterializeSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def freshFrame = spark.range(0, 1000)
    .select(col("id"), (col("id") % 7).as("k"))
    .groupBy("k").agg(sum("id").as("s"))

  /** Checkpoint scratch that cleans up after the suite (VERDICT r14
    * #6: the bare createTempDirectory calls accumulated graft-ckpt-*
    * dirs in /tmp across every sbt test run). TempDirs purges its
    * previous root per label AND registers a JVM shutdown hook. */
  private def scratch(label: String): String = TempDirs.fresh(label)

  test("conf unset: checkpointed == localCheckpoint (lineage truncated, values unchanged)") {
    assert(spark.conf.getOption(Materialize.ConfKey).isEmpty)
    val before = freshFrame.collect().map(_.toSeq).toSet
    val cp = freshFrame.checkpointed()
    val plan = cp.queryExecution.optimizedPlan.getClass.getSimpleName
    assert(plan == "LogicalRDD", s"expected truncated lineage, got $plan")
    assert(cp.collect().map(_.toSeq).toSet == before)
  }

  test("conf set: reliable checkpoint — files land in the dir, lineage truncated, values unchanged") {
    val dir = scratch("ckpt")
    spark.conf.set(Materialize.ConfKey, dir)
    try {
      val before = freshFrame.collect().map(_.toSeq).toSet
      val cp = freshFrame.checkpointed()
      val plan = cp.queryExecution.optimizedPlan.getClass.getSimpleName
      assert(plan == "LogicalRDD", s"expected truncated lineage, got $plan")
      assert(cp.collect().map(_.toSeq).toSet == before)
      // Reliable = on (fault-tolerant) storage, not executor memory: the
      // checkpoint dir now contains rdd-* part files.
      val entries = Files.walk(Paths.get(dir)).iterator().asScala
        .map(_.getFileName.toString).toList
      assert(entries.exists(_.startsWith("rdd-")), s"no rdd-* under $dir: $entries")
    } finally spark.conf.unset(Materialize.ConfKey)
  }

  test("lazy (eager=false) reliable checkpoint materializes inside the call (always-eager path)") {
    // The reliable path brackets the checkpoint in persist/unpersist to
    // avoid the write job recomputing the subtree, which requires the
    // materializing action to run inside the bracket — so eager=false
    // still checkpoints immediately there (locally it stays lazy).
    val dir = scratch("ckpt-lazy")
    spark.conf.set(Materialize.ConfKey, dir)
    try {
      val cp = freshFrame.checkpointed(false)
      val entries = Files.walk(Paths.get(dir)).iterator().asScala
        .map(_.getFileName.toString).toList
      assert(entries.exists(_.startsWith("rdd-")),
        s"reliable checkpoint should have materialized in the call; $dir held: $entries")
      assert(cp.count() == 7)
    } finally spark.conf.unset(Materialize.ConfKey)
  }

  test("reliable checkpoint computes the subtree ONCE (persist absorbs the write job)") {
    // An unpersisted reliable RDD checkpoint recomputes every partition
    // in the checkpoint-write job that follows the materializing action
    // — doubling exactly the compute a materialization point exists to
    // pay once. The counter counts subtree evaluations per row.
    val dir = scratch("ckpt-once")
    spark.conf.set(Materialize.ConfKey, dir)
    MaterializeSpec.evals.set(0)
    try {
      val ds = spark.range(0, 100).as[Long]
        .map { x => MaterializeSpec.evals.incrementAndGet(); x * 2 }
      val cp = ds.checkpointed()
      assert(cp.count() == 100)
      val n = MaterializeSpec.evals.get()
      assert(n == 100, s"subtree evaluated $n row-computations for 100 rows — " +
        "the checkpoint-write job recomputed instead of reading the persisted blocks")
    } finally spark.conf.unset(Materialize.ConfKey)
  }

  test("a dedup-tier query is hash-stable under the reliable path") {
    // q27 exercises DedupQueries' checkpointed() sites end-to-end; its
    // result must not depend on which durability path materialized the
    // intermediates.
    val dir = "/root/testdata/sf0.001"
    val local = SparkEntry.queries("q27_exact_dedup")(spark, dir)
      .collect().map(_.toSeq).toList
    val ckptDir = scratch("ckpt-q27")
    spark.conf.set(Materialize.ConfKey, ckptDir)
    try {
      val reliable = SparkEntry.queries("q27_exact_dedup")(spark, dir)
        .collect().map(_.toSeq).toList
      assert(reliable == local)
    } finally spark.conf.unset(Materialize.ConfKey)
  }
}

/** JVM-wide evaluation counter for the single-computation test (tasks
  * run in this JVM under local mode, so a static is visible to them). */
object MaterializeSpec {
  val evals = new java.util.concurrent.atomic.AtomicLong(0)
}
