package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r15 diagnostic: why does the IVF-PQ encode's task-time blow up ~30x
  * when the base scan is fanned out? Times ivfpqSub(base).count-style
  * materialization at several partition counts.
  * Usage: Test/runMain graft.EncodeProbe [sfDir]
  */
object EncodeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.configure(spark)
    val stages = scala.collection.mutable.ArrayBuffer[(Long, Int)]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        stages += ((sc.stageInfo.taskMetrics.executorRunTime, sc.stageInfo.numTasks))
    })
    def time(label: String)(df: => DataFrame): Unit = {
      org.apache.spark.GraftSpark.drainListeners(spark.sparkContext)
      stages.clear()
      val t0 = System.nanoTime()
      df.write.mode("overwrite").format("noop").save()
      val wall = (System.nanoTime() - t0) / 1e9
      org.apache.spark.GraftSpark.drainListeners(spark.sparkContext)
      println(f"$label%-40s wall=$wall%6.2f s  taskRun=${stages.map(_._1).sum / 1000.0}%7.2f s  stages=${stages.size}")
    }
    val raw = Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"), functions.VectorOps.asDouble(col("embedding")).as("ev"))
    import operators.SimilarityQueries.{ivfpqSub, IvfCells}
    def cents(b: DataFrame) = b.filter(col("vec_id") < IvfCells)
      .select(col("vec_id").as("cell_id"), col("ev").as("cv"))
    // warm
    time("warm unspread encode")(ivfpqSub(raw, cents(raw)))
    for (p <- Seq(1, 4, 8, 32)) {
      val b = if (p == 1) raw else raw.repartition(p)
      time(s"encode, base partitions=$p (run 1)")(ivfpqSub(b, cents(b)))
      time(s"encode, base partitions=$p (run 2)")(ivfpqSub(b, cents(b)))
    }
    // Decouple: spread vectors, UNSPREAD centroid source.
    val b32 = raw.repartition(32)
    time("encode, vecs=32 cents=raw (run 1)")(ivfpqSub(b32, cents(raw)))
    time("encode, vecs=32 cents=raw (run 2)")(ivfpqSub(b32, cents(raw)))
    // Down the q136 chain: codes assignment at the 256-entry codebook.
    import graft.Materialize.CheckpointOps
    import operators.SimilarityQueries.{ivfpqCodes, Pq8K}
    for (p <- Seq(1, 32)) {
      val b = if (p == 1) raw else raw.repartition(p)
      val sub = ivfpqSub(b, cents(b)).checkpointed()
      val cb = sub.filter(col("vec_id") < Pq8K)
        .select(col("m"), col("vec_id").as("code"), col("sv").as("cvr"))
      time(s"codes(Pq8K), base=$p (run 1)")(ivfpqCodes(sub, cb))
      time(s"codes(Pq8K), base=$p (run 2)")(ivfpqCodes(sub, cb))
    }
    // Inline q126/q136 curve chain (mirror of ivfpqNprobeCurve) staged.
    import org.apache.spark.sql.expressions.Window
    import graft.functions.{Exact, VectorOps}
    val S = pipeline.Embedder.Dim / operators.SimilarityQueries.PqM
    for (p <- Seq(1, 32)) {
      val b = if (p == 1) raw else raw.repartition(p)
      val cs = cents(b)
      val sub = ivfpqSub(b, cs).checkpointed()
      val cb = sub.filter(col("vec_id") < Pq8K)
        .select(col("m"), col("vec_id").as("code"), col("sv").as("cvr"))
      val codes = ivfpqCodes(sub, cb)
      val qs = b.filter(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"), col("ev").as("qv"))
      val crank = qs.crossJoin(broadcast(cs))
        .withColumn("d", round(VectorOps.l2(col("qv"), col("cv")), 6))
        .withColumn("crank", row_number().over(
          Window.partitionBy(col("query_id")).orderBy(col("d"), col("cell_id"))))
        .select(col("query_id"), col("cell_id"), col("crank"))
      val qres = crank.join(broadcast(qs), "query_id")
        .join(broadcast(cs), "cell_id")
        .select(col("query_id"), col("cell_id"), col("crank"),
          zip_with(col("qv"), col("cv"), (x, y) => x - y).as("qr"))
      val dt = qres.crossJoin(broadcast(cb))
        .withColumn("t", round(VectorOps.l2(
          slice(col("qr"), col("m") * S + 1, lit(S)), col("cvr")), 6))
        .select(col("query_id"), col("cell_id"), col("crank"),
          col("m"), col("code"), round(col("t") * col("t"), 6).as("d2"))
      val adc = codes.join(broadcast(dt), Seq("cell_id", "m", "code"))
        .groupBy(col("query_id"), col("vec_id"))
        .agg(round(sqrt(Exact.dsum(col("d2"))), 6).as("ad"),
          min(col("crank")).as("crank"))
      time(s"curve adc, base=$p (run 1)")(adc)
      time(s"curve adc, base=$p (run 2)")(adc)
      val cand = adc.select(col("query_id"), col("vec_id"), col("ad"), col("crank"),
          explode(sequence(lit(1), lit(IvfCells))).as("nprobe"))
        .filter(col("crank") <= col("nprobe"))
      val short = cand.withColumn("rn", row_number().over(
          Window.partitionBy(col("query_id"), col("nprobe"))
            .orderBy(col("ad"), col("vec_id"))))
        .filter(col("rn") <= 15)
      time(s"curve short, base=$p (run 1)")(short)
      time(s"curve short, base=$p (run 2)")(short)
    }
    spark.stop()
  }
}
