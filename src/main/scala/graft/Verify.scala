package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new plans.GraftExtensions) // cosine_sim + FuseCosine
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.configure(spark)
    Tables.assertIdHeadroom(spark, sfDir) // planted-copy offsets need id room
    new java.io.File(outDir).mkdirs()
    // GRAFT_VERIFY_ONLY=q1,q2 — dump a subset while iterating locally
    // (tools/check_oracle.py --only passes it through). Unset = all;
    // the driver's gate always runs unset, so the manifest stays full.
    val only = sys.env.get("GRAFT_VERIFY_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val written = SparkEntry.queries.toSeq
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .flatMap { case (name, fn) =>
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        Some(name)
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        // Message-only by default (the driver greps one line per fail);
        // full stack on demand when diagnosing locally.
        if (sys.env.contains("GRAFT_VERIFY_STACK")) e.printStackTrace()
        None
      }
    }
    // Manifest of successfully-written queries: the checker fails any
    // registered query missing from it (guards against stale parquet
    // from a previous run silently passing the gate).
    Files.writeString(Paths.get(s"$outDir/manifest.txt"),
      written.sorted.mkString("\n"))
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // Engine-version stamp alongside the dump: when a hash drifts, the
    // artifact itself names which Spark produced it (round 6's silent
    // 4.1.2 bump cost a round of diagnosis).
    Files.writeString(Paths.get(s"$outDir/versions.json"),
      s"""{"spark": ${q(spark.version)}, "scala": ${q(util.Properties.versionNumberString)}}""")
    spark.stop()
  }
}
