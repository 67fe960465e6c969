package graft
object VsDebug {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    import org.apache.spark.sql.functions._
    val url = graft.sinks.JdbcSink.memoryUrl("graft_vstore_e2e")
    val summaries = graft.pipeline.DailySummary.run(spark, "/root/testdata/sf0.001").localCheckpoint()
    val n = summaries.count()
    val first = graft.pipeline.VectorStore.store(summaries, url)
    println("STATS=" + first)
    val back = graft.pipeline.VectorStore.load(spark, url)
    println("COUNT=" + back.count())
    val joined = back.join(summaries.select(col("vector_id"),
        col("semantic_sentence").as("want_sentence"), col("embedding").as("want_vec")),
      "vector_id")
    println("MIS=" + joined.filter(col("semantic_sentence") =!= col("want_sentence")).count())
    joined.filter(col("semantic_sentence") =!= col("want_sentence"))
      .select("vector_id", "semantic_sentence", "want_sentence").take(2).foreach { r =>
        println("ID " + r.getString(0))
        println("GOT [" + String.valueOf(r.getString(1)).take(150).replace("\n","\\n") + "]")
        println("WANT[" + String.valueOf(r.getString(2)).take(150).replace("\n","\\n") + "]")
      }
  }
}
