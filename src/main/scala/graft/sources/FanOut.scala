package graft.sources

import org.apache.spark.sql.{Dataset, Encoder, SparkSession}
import org.apache.spark.util.LongAccumulator
import scala.util.control.NonFatal

/** The shared unit-per-task fan-out discipline behind the live scans
  * (weather cities, climate stations): each `(name, id)` item fetches
  * in its own task under the jittered bounded-backoff retry; an item
  * that exhausts its budget is skipped AND counted through the given
  * accumulator; and the frame is MATERIALIZED (localCheckpoint) before
  * returning — a lazy frame would re-run the whole network fan-out on
  * every downstream action and double-count the metric on task
  * re-execution. One copy of the invariant, two clients on it. */
private[sources] object FanOut {
  def fetch[T](spark: SparkSession, items: Seq[(String, String)],
      retry: RetryConf, skipped: LongAccumulator)(
      one: (String, String, Int) => Seq[T])(implicit enc: Encoder[T]): Dataset[T] = {
    import spark.implicits._
    spark.createDataset(items)
      .repartition(math.max(1, items.size)) // item-per-task fan-out
      .flatMap { case (name, id) =>
        try RetryPolicy.withRetry(retry.maxAttempts, retry.baseDelayMs, retry.jitterMs) {
          attempt => one(name, id, attempt)
        } catch {
          case NonFatal(_) => skipped.add(1); Nil // skip-and-count
        }
      }
      .localCheckpoint()
  }
}
