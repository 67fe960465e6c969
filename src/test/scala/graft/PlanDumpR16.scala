package graft

import java.io.{File, PrintWriter}
import org.apache.spark.sql.SparkSession

/** Round-16 plan evidence: `.explain("formatted")` for named queries to
  * individual files — `plans/r16/<query>_<tag>.txt` — so before/after
  * optimization plan diffs are committable verbatim.
  *
  * Pseudo-entries expose sub-frames whose registered queries hide the
  * interesting shape behind a checkpoint/persist boundary:
  *  - `qc_features`: the shared quality-classifier feature frame
  *    (q115/q116/q117/q118/q125 all build on it; q115's persist and the
  *    training loop's local trace otherwise truncate the plan).
  *  - `ensemble_joined`: the q128/q131/q132 shared three-signal join
  *    (the registered queries checkpoint it).
  *  - `bpe_apply_round`: one bare BPE merge round (r15 evidence shape).
  *
  * Usage: Test/runMain graft.PlanDumpR16 <tag> <q1,q2,...> [sfDir] [outDir]
  */
object PlanDumpR16 {
  def main(args: Array[String]): Unit = {
    val tag = args(0)
    val names = args(1).split(",").map(_.trim).filter(_.nonEmpty)
    val sfDir = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val outDir = if (args.length > 3) args(3) else "plans/r16"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.configure(spark)
    new File(outDir).mkdirs()
    names.foreach { name =>
      val df =
        if (name == "qc_features")
          operators.CurationQueries.qcFeatures(spark, sfDir)
        else if (name == "ensemble_joined")
          operators.ReleaseQueries.ensembleJoined(spark, sfDir)
        else if (name == "curve_base_spread" && tag == "before")
          // the r15 shape: bare scan+cast, no Exchange (q126 keeps this)
          Tables.load(spark, sfDir, "embeddings")
            .select(org.apache.spark.sql.functions.col("vec_id"),
              graft.functions.VectorOps.asDouble(
                org.apache.spark.sql.functions.col("embedding")).as("ev"))
        else if (name == "sigstats_commit_write" && tag == "before") {
          // the r15 write-side shape: no clustering exchange
          val idx = pipeline.CardIndex.prepared(spark, sfDir)
          spark.read.parquet(s"$idx/sigstats").drop("bucket")
            .withColumn("bucket",
              pipeline.SigstatsStore.bucketOf(
                org.apache.spark.sql.functions.col("sig")))
        }
        else if (name == "curve_base_spread")
          // q136/q137's checkpointed base AFTER the r16 fan-out — the
          // registered queries' explains truncate at the checkpoint, so
          // the added Exchange (REPARTITION_BY_NUM on vec_id) is only
          // inspectable here; the `_before` twin is the plain base.
          operators.SimilarityQueries.embSpread(spark, sfDir)
        else if (name == "sigstats_commit_write") {
          // The write-side frame of SigstatsStore.commit AFTER the r16
          // bucket clustering: the Exchange(bucket) between the updated
          // rows and the dynamic-partition writer is the change; before,
          // the writer consumed ~30 mixed-bucket partitions directly.
          val idx = pipeline.CardIndex.prepared(spark, sfDir)
          spark.read.parquet(s"$idx/sigstats").drop("bucket")
            .withColumn("bucket",
              pipeline.SigstatsStore.bucketOf(
                org.apache.spark.sql.functions.col("sig")))
            .repartition(pipeline.SigstatsStore.NumBuckets,
              org.apache.spark.sql.functions.col("bucket"))
        }
        else if (name == "q133_pruned_probe") {
          // q133's registered plan truncates at the batch-features
          // checkpoint; this is the frame BELOW it — the card update
          // whose sigstats FileScan must show the bucket partition
          // filter (VERDICT r15 #5 asked for exactly this dump).
          val idx = pipeline.CardIndex.prepared(spark, sfDir)
          import graft.Materialize.CheckpointOps
          val bf = operators.ReleaseQueries
            .cardFeatures(operators.ReleaseQueries.cardBatch(spark, sfDir))
            .checkpointed()
          val touched = pipeline.SigstatsStore.touchedBuckets(bf)
          // The dumped frame is the pruned probe scan itself:
          // cardUpdate checkpoints every downstream intermediate, so
          // the FileScan (the object of the claim) is only inspectable
          // here. `touched` is computed from the real batch exactly as
          // q133 computes it.
          spark.read.parquet(s"$idx/sigstats")
            .where(org.apache.spark.sql.functions.col("bucket")
              .isin(touched: _*))
            .drop("bucket")
        }
        else if (name == "bpe_apply_round")
          operators.TextQueries.bpeApplyMerge(
            operators.TextQueries.bpeWords0(
              Tables.load(spark, sfDir, "documents").select("doc_id", "text")),
            "e", "_")
        else SparkEntry.queries(name)(spark, sfDir)
      val pw = new PrintWriter(new File(outDir, s"${name}_$tag.txt"), "UTF-8")
      try {
        pw.println(s"# $name — explain(formatted) at $sfDir [$tag]")
        pw.println(df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      } finally pw.close()
      println(s"[plandump] wrote $outDir/${name}_$tag.txt")
    }
    spark.stop()
  }
}
