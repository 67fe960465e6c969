package graft.sources

import org.apache.spark.sql.{Dataset, Encoder, SparkSession}
import scala.util.control.NonFatal

/** One fan-out's outcome: the flattened row frame plus EXACT loss
  * counters. `skipped` = items that exhausted their retry budget;
  * `emptyOk` = items that responded successfully but produced zero
  * rows (e.g. a station with no valid reading for the date). */
private[sources] final case class FanOutFetch[T](
    frame: Dataset[T], skipped: Long, emptyOk: Long)

/** The shared unit-per-task fan-out discipline behind the live scans
  * (weather cities, climate stations): each `(name, id)` item fetches
  * in its own task under the jittered bounded-backoff retry; an item
  * that exhausts its budget is skipped AND counted; and the frame is
  * MATERIALIZED (localCheckpoint) before returning — a lazy frame
  * would re-run the whole network fan-out on every downstream action.
  *
  * The loss counters are NOT accumulators: Spark only deduplicates
  * accumulator updates in actions, so a task retry or speculative
  * duplicate during the materialization job would over-count a
  * transformation-side `add`. Instead each item emits ONE status row
  * `(rows, ok)`; the counters are aggregated from the CHECKPOINTED
  * status frame, so they reflect exactly the task attempts whose
  * output was committed — exact-once, retry-safe.
  * One copy of the invariant, two clients on it. */
private[sources] object FanOut {
  def fetch[T](spark: SparkSession, items: Seq[(String, String)],
      retry: RetryConf)(one: (String, String, Int) => Seq[T])(
      implicit enc: Encoder[(Seq[T], Boolean)], encT: Encoder[T]): FanOutFetch[T] = {
    import spark.implicits._
    val statused = spark.createDataset(items)
      .repartition(math.max(1, items.size)) // item-per-task fan-out
      .map { case (name, id) =>
        try (RetryPolicy.withRetry(retry.maxAttempts, retry.baseDelayMs, retry.jitterMs) {
          attempt => one(name, id, attempt)
        }, true)
        catch { case NonFatal(_) => (Seq.empty[T], false) } // skip-and-count
      }(enc)
      .localCheckpoint()
    val skipped = statused.filter(s => !s._2).count()
    val emptyOk = statused.filter(s => s._2 && s._1.isEmpty).count()
    FanOutFetch(statused.flatMap(_._1)(encT), skipped, emptyOk)
  }
}
