package graft.operators

import graft.{NamedQuery, Tables}
import graft.NamedQuery.{q, PresentationOps}
import graft.pipeline.MediaOps
import org.apache.spark.sql.functions._

/** Multimodal-column queries (north-star brief: binary payloads with
  * typed metadata, decode as a batched partition-local kernel).
  *
  * q39 is pure columnar binary algebra and oracle-checked (the DuckDB
  * mirror computes on the source text, which is byte-identical to the
  * UTF-8 payload for this ASCII corpus). q40 exercises the typed
  * mapPartitions decode path; since r9 it is hash-checked too — values
  * roll up q101's oracled per-asset features, and the batch surface is
  * pinned as a boolean invariant rather than exact runtime sizes.
  */
object MediaQueries {

  val all: Seq[NamedQuery] = Seq(

    // ----- binary columns, metadata, header sniff, strided frame sample:
    // all columnar, pushed projections, no shuffle except the final sort.
    q("q39_media_features",
      "multimodal: binary payload stats + header/frame-sample hex slices",
      """SELECT media_id, kind, width, height,
        |  octet_length(encode(text)) AS n_bytes,
        |  md5(text) AS content_hash,
        |  hex(encode(substring(text, 1, 8))) AS header_hex,
        |  hex(encode(substring(text, 33, 4))) AS frame1_hex,
        |  hex(encode(substring(text, 65, 4))) AS frame2_hex
        |FROM (
        |  SELECT doc_id AS media_id,
        |    ['image', 'audio', 'video'][CAST(doc_id % 3 + 1 AS INT)] AS kind,
        |    64 + (doc_id % 8) * 16 AS width,
        |    48 + (doc_id % 4) * 16 AS height,
        |    text
        |  FROM documents)
        |ORDER BY media_id""".stripMargin) { (s, dir) =>
      val media = MediaOps.mediaTable(Tables.load(s, dir, "documents"))
      media.select(
          col("media_id"), col("kind"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          length(col("payload")).cast("long").as("n_bytes"),
          md5(col("payload")).as("content_hash"),
          hex(substring(col("payload"), 1, 8)).as("header_hex"),
          hex(substring(col("payload"), 33, 4)).as("frame1_hex"),
          hex(substring(col("payload"), 65, 4)).as("frame2_hex"))
        .orderBy("media_id")
    },

    // ----- the batched kernel's PER-ASSET outputs are deterministic
    // functions of the payload (stub: brightness = mean of the first 64
    // bytes, header = hex of the first 4), so this half of the decode
    // path gets a REAL oracle: DuckDB recomputes the same features from
    // the source text (byte-identical to the UTF-8 payload — the q39
    // ASCII identity). brightness ships as micro-units (×1e6, BIGINT) so
    // the compare is integer-exact rather than ULP-sensitive. Only q40's
    // batch_size — a runtime partition-slicing artifact, the genuinely
    // non-SQL surface — stays rows-only.
    q("q101_media_decode_values",
      "multimodal: per-asset decoded features through the batched mapPartitions kernel",
      """SELECT doc_id AS media_id,
        |  ['image', 'audio', 'video'][CAST(doc_id % 3 + 1 AS INT)] AS kind,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  CAST(ROUND(CASE WHEN length(text) = 0 THEN 0.0
        |        ELSE list_avg(list_transform(range(1, least(64, length(text)) + 1),
        |                                     i -> unicode(text[i]))) END * 1e6, 0) AS BIGINT)
        |    AS brightness_micro,
        |  hex(encode(substring(text, 1, 4))) AS header
        |FROM documents ORDER BY media_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      val media = MediaOps.mediaTable(Tables.load(s, dir, "documents"))
        .as[MediaOps.MediaRow]
      MediaOps.decodeFeatures(media)
        .select(col("media_id"), col("kind"), col("n_bytes"),
          rint(col("brightness") * 1e6).cast("long").as("brightness_micro"),
          col("header"))
        .presented("media_id")
    },

    // ----- the batched kernel path: typed Dataset boundary →
    // mapPartitions decode stub → per-kind rollup. Hash-checked since
    // r9 (VERDICT r8 #6): the VALUE columns roll up the same per-asset
    // kernel outputs q101 oracles (micro-unit longs, so the sums are
    // integer-exact and order-independent), and the genuinely non-SQL
    // batch surface ships as an INVARIANT — batches_ok must read true,
    // which the oracle states as a literal, so a kernel whose batch
    // slicing breaks its 1..BatchSize contract flips the column and
    // fails the hash. Exact per-partition batch sizes remain runtime
    // artifacts by design; their LAW is what the gate now pins.
    q("q40_media_decode_stub",
      "multimodal: batched mapPartitions decode (stubbed kernel) + rollup",
      s"""SELECT kind, COUNT(*) AS n_assets,
         |  CAST(SUM(n_bytes) AS BIGINT) AS sum_bytes,
         |  CAST(SUM(brightness_micro) AS BIGINT) AS sum_brightness_micro,
         |  TRUE AS batches_ok
         |FROM (
         |  SELECT ['image', 'audio', 'video'][CAST(doc_id % 3 + 1 AS INT)] AS kind,
         |    CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
         |    CAST(ROUND(CASE WHEN length(text) = 0 THEN 0.0
         |          ELSE list_avg(list_transform(range(1, least(64, length(text)) + 1),
         |                                       i -> unicode(text[i]))) END * 1e6, 0) AS BIGINT)
         |      AS brightness_micro
         |  FROM documents)
         |GROUP BY kind ORDER BY kind""".stripMargin) { (s, dir) =>
      import s.implicits._
      val media = MediaOps.mediaTable(Tables.load(s, dir, "documents"))
        .as[MediaOps.MediaRow]
      MediaOps.decodeFeatures(media)
        .groupBy(col("kind"))
        .agg(
          count(lit(1)).as("n_assets"),
          sum(col("n_bytes")).as("sum_bytes"),
          sum(rint(col("brightness") * 1e6).cast("long")).as("sum_brightness_micro"),
          expr(s"bool_and(batch_size >= 1 AND batch_size <= ${MediaOps.BatchSize})")
            .as("batches_ok"))
        .presented("kind")
    }
  )
}
