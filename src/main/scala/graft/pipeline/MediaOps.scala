package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (north-star brief): image/audio/video as
  * opaque `binary` payloads + typed metadata, with decode / feature
  * extraction as a BATCHED per-partition operator — the Scala analog of
  * a `mapInPandas` decode (same batch shape: fixed-size slices of each
  * partition handed to a vectorized kernel).
  *
  * The decode kernel itself is a clearly-marked DETERMINISTIC STUB (no
  * image/audio libs in this environment); everything around it — the
  * schema, the binary column, partition-parallel batching, the typed
  * Dataset boundary — is the real production plumbing. Swapping
  * [[MediaOps.decodeStub]] for a JNI/FFI decoder changes no plan shape.
  */
object MediaOps {

  /** One media asset: opaque payload + the typed metadata a real
    * pipeline would carry alongside (dims for images, rate for audio). */
  final case class MediaRow(
      media_id: Long, kind: String, payload: Array[Byte],
      width: Int, height: Int)

  /** Stub-decoded features. `brightness` stands in for a real decoded
    * statistic; `header` for a codec sniff; both deterministic. */
  final case class MediaFeatures(
      media_id: Long, kind: String, n_bytes: Long,
      brightness: Double, header: String, batch_size: Int)

  val BatchSize = 32

  /** Fabricate the media table deterministically from `documents`:
    * payload = UTF-8 bytes of the text (stands in for encoded pixels /
    * samples), kind cycles by id, dims derive from id. Real pipelines
    * read this shape straight off parquet/object storage. */
  def mediaTable(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      encode(col("text"), "UTF-8").as("payload"),
      (lit(64) + (col("doc_id") % 8) * 16).cast("int").as("width"),
      (lit(48) + (col("doc_id") % 4) * 16).cast("int").as("height"))

  /** STUB decode kernel — deterministic fake of the external decoder.
    * A real implementation would hand `batch` to an image/audio library
    * in one vectorized call; signature and batch shape are the contract.
    * brightness := mean of the first 64 payload bytes (unsigned). */
  def decodeStub(batch: Seq[MediaRow]): Seq[MediaFeatures] =
    batch.map { m =>
      val head = m.payload.take(64)
      val brightness =
        if (head.isEmpty) 0.0
        else head.map(b => (b & 0xff).toDouble).sum / head.length
      MediaFeatures(
        media_id = m.media_id,
        kind = m.kind,
        n_bytes = m.payload.length.toLong,
        brightness = math.rint(brightness * 1e6) / 1e6,
        header = m.payload.take(4).map(b => f"${b & 0xff}%02X").mkString,
        batch_size = batch.size)
    }

  /** Partition-parallel batched decode: each partition is sliced into
    * [[BatchSize]]-row batches, one kernel call per batch (the
    * `mapInPandas` batch contract). No shuffle — decode rides the scan. */
  def decodeFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.grouped(BatchSize).flatMap(batch => decodeStub(batch.toSeq))
    }
  }
}
