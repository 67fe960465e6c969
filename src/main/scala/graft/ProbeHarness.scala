package graft

import org.apache.spark.sql.SparkSession

/** Shared measurement harness for the scale probes (ScaleProbe,
  * StreamScaleProbe) — one copy of the session tuning, the min-of-two
  * measure discipline, and the JSON formatting, so a fix to any of
  * them (the pass-2 error recording, the backslash escaping) cannot
  * drift between probe mains. Bench keeps its own richer harness
  * (listener accounting, warm passes, remeasure tail); the probes
  * share THIS one.
  */
private[graft] object ProbeHarness {

  /** The probes' common session shape (mirrors Bench's retention caps). */
  def session(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ui.retainedExecutions", "5")
      .config("spark.ui.retainedJobs", "20")
      .config("spark.ui.retainedStages", "50")
      .config("spark.ui.retainedTasks", "2000")
      .config("spark.sql.session.timeZone", "UTC")
      .withExtensions(new plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.configure(spark)
    spark
  }

  /** Min-of-two-passes wall time around `once`, which runs the measured
    * work and returns (seconds, payload, error). The FIRST pass's
    * payload (shuffle bytes, row count) is kept — byte and row counts
    * reproduce exactly; only wall time is noisy. A pass-2 failure keeps
    * pass 1's timing but is RECORDED: a silently single-pass number
    * would claim denoising it never got, and a reproducible re-run
    * failure is exactly what a probe exists to surface. */
  def minOfTwo[P](once: () => (Double, P, Option[String])): (Double, P, Option[String]) = {
    val (t1, p1, e1) = once()
    if (e1.isDefined) (t1, p1, e1)
    else {
      val (t2, _, e2) = once()
      (if (e2.isEmpty) math.min(t1, t2) else t1, p1,
        e2.map("second pass failed (first pass timing kept): " + _))
    }
  }

  def f3(x: Double): String =
    String.format(java.util.Locale.ROOT, "%.3f", Double.box(x))

  /** Escape a string for embedding in a JSON literal. */
  def jstr(s: String): String =
    s.replace("\\", "\\\\").replace("\"", "\\\"")

  def errMsg(e: Throwable): String =
    e.getClass.getSimpleName + ": " +
      String.valueOf(e.getMessage).replaceAll("\\s+", " ").take(160)
}
