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
  * `one` returns an ITERATOR, and the rows stream straight through
  * `flatMap` into the checkpoint's block writer — a year-long bulk CSV
  * per station flows through task memory one row at a time instead of
  * materializing as a Seq inside a single status row. Retry scope
  * under that contract: [[RetryPolicy.withRetry]] guards the CALL of
  * `one` (connect, status line, header validation — everything a
  * client does before returning its iterator); a fault thrown
  * mid-iteration propagates and fails the TASK, which Spark re-runs
  * whole. That re-run is the standard at-least-once task attempt: it
  * cannot double rows, because only one committed attempt's output
  * ever lands in the checkpointed frame.
  *
  * The loss counters are NOT accumulators, for the same at-least-once
  * reason: Spark only deduplicates accumulator updates inside actions,
  * so a task retry or speculative duplicate during materialization
  * would over-count a transformation-side `add`. Instead each item
  * emits ONE trailing status row, and both counters aggregate from the
  * CHECKPOINTED frame — they reflect exactly the task attempts whose
  * output was committed. Exact-once, retry-safe.
  * One copy of the invariant, two clients on it. */
private[sources] object FanOut {
  def fetch[T](spark: SparkSession, items: Seq[(String, String)],
      retry: RetryConf)(one: (String, String, Int) => Iterator[T])(
      implicit enc: Encoder[(Int, Option[T], Boolean)], encT: Encoder[T]): FanOutFetch[T] = {
    import spark.implicits._
    // Row shape: (item idx, Some(row), true) for data; one trailing
    // (idx, None, ok) status row per item. The idx ties zero-row
    // successes to their status row after flattening.
    val statused = spark.createDataset(items.zipWithIndex)
      .repartition(math.max(1, items.size)) // item-per-task fan-out
      .flatMap { case ((name, id), idx) =>
        val it =
          try RetryPolicy.withRetry(retry.maxAttempts, retry.baseDelayMs, retry.jitterMs) {
            attempt => one(name, id, attempt)
          }
          catch { case NonFatal(_) => null } // skip-and-count
        if (it == null) Iterator((idx, Option.empty[T], false))
        else it.map(t => (idx, Option(t), true)) ++ Iterator((idx, Option.empty[T], true))
      }(enc)
      .localCheckpoint()
    // Per-item rollup off the committed frame (items are few — the
    // group count is the fan-out width).
    val perItem = statused.groupByKey(_._1).mapGroups { (_, rows) =>
      var ok = false
      var n = 0L
      rows.foreach { r => if (r._2.isDefined) n += 1 else ok = r._3 }
      (ok, n)
    }.localCheckpoint()
    val skipped = perItem.filter(r => !r._1).count()
    val emptyOk = perItem.filter(r => r._1 && r._2 == 0L).count()
    FanOutFetch(statused.filter(_._2.isDefined).map(_._2.get)(encT), skipped, emptyOk)
  }
}
