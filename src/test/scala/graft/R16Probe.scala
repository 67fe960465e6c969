package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off r16 attribution probe for the 32-core per-task fixed cost in
  * the q32 signature stage: times the simhash chain with pieces peeled
  * off, at the width given by SPARK_GRAFT_CPUS, so the fixed cost can
  * be attributed to (a) the checkpoint block store, (b) the 61-agg
  * vote aggregate, (c) the shingle window sort, or (d) the explode.
  *
  * Usage: SPARK_GRAFT_CPUS=32 Test/runMain graft.R16Probe [sfDir]
  */
object R16Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .withExtensions(new plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.configure(spark)
    val base = Tables.load(spark, sfDir, "documents").select("doc_id", "text")
    val u = base.unionAll(
      base.filter(col("doc_id") % 9 === 0)
        .select((col("doc_id") + 30000).as("doc_id"),
          regexp_replace(col("text"), "^[a-z0-9]+ ", "").as("text")))
      .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
    def time(label: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      // warm once, then min of 3
      df.write.mode("overwrite").format("noop").save()
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df.write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] $label%-28s min=${ts.min}%.3f s  (all: ${ts.map(t => f"$t%.2f").mkString(", ")})")
    }
    // (d) tokenize+explode only
    time("explode-only") {
      u.select(col("doc_id"),
        posexplode(split(lower(col("text")), "[^a-z0-9]+")).as(Seq("pos", "tok")))
        .filter(col("tok") =!= "")
    }
    // (c) + shingle window (lead x2) + concat + hash
    val shingled = {
      import org.apache.spark.sql.expressions.Window
      val toks = u.select(col("doc_id"),
          posexplode(split(lower(col("text")), "[^a-z0-9]+")).as(Seq("pos", "tok")))
        .filter(col("tok") =!= "")
      val w = Window.partitionBy("doc_id").orderBy("pos")
      toks.withColumn("t1", lead(col("tok"), 1).over(w))
        .withColumn("t2", lead(col("tok"), 2).over(w))
        .filter(col("t2").isNotNull)
        .select(col("doc_id"),
          concat_ws(" ", col("tok"), col("t1"), col("t2")).as("t"))
        .withColumn("h", graft.functions.TextOps.hash60(col("t")))
    }
    time("shingle+md5")(shingled)
    // (b) + 61-agg votes
    val votes = {
      val bitSums = (0 until 60).map(j =>
        sum(shiftright(col("h"), j).bitwiseAND(lit(1L))).as(s"b$j"))
      shingled.groupBy(col("doc_id")).agg(count(lit(1)).as("cnt"), bitSums: _*)
    }
    time("votes-agg")(votes)
    // full signature frame, no checkpoint
    time("sigs-nockpt")(operators.DedupQueries.simhashSigs(u))
    // (a) signature frame + eager localCheckpoint (isolates block store)
    time("sigs+localCkpt") {
      import graft.Materialize.CheckpointOps
      val df = operators.DedupQueries.simhashSigs(u).checkpointed()
      df.unpersist(blocking = true)
      df
    }
    spark.stop()
  }
}
