package graft

import graft.pipeline.MediaOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The multimodal plumbing contract: binary payload round-trip, batch
  * shape of the partition-local decode, and stub determinism. */
class MediaOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs = Seq(
    (0L, "alpha beta gamma delta"),
    (1L, "epsilon zeta"),
    (2L, ""),
    (3L, "eta theta iota kappa lambda mu")
  ).toDF("doc_id", "text")

  test("mediaTable: binary payload is the UTF-8 bytes; kind cycles; dims derive") {
    val rows = MediaOps.mediaTable(docs).orderBy("media_id").collect()
    assert(rows.length == 4)
    val r0 = rows(0)
    assert(r0.getAs[Array[Byte]]("payload").sameElements("alpha beta gamma delta".getBytes("UTF-8")))
    assert(rows.map(_.getAs[String]("kind")).toSeq == Seq("image", "audio", "video", "image"))
    assert(r0.getAs[Int]("width") == 64 && r0.getAs[Int]("height") == 48)
  }

  test("decodeStub: deterministic, empty payload → brightness 0, header hex") {
    val m = MediaOps.MediaRow(7L, "image", "abcd".getBytes("UTF-8"), 64, 48)
    val Seq(f1) = MediaOps.decodeStub(Seq(m))
    val Seq(f2) = MediaOps.decodeStub(Seq(m))
    assert(f1 == f2)
    assert(f1.header == "61626364")
    assert(f1.brightness == ("abcd".getBytes("UTF-8").map(_.toDouble).sum / 4))
    val Seq(fe) = MediaOps.decodeStub(Seq(m.copy(payload = Array.empty)))
    assert(fe.brightness == 0.0 && fe.n_bytes == 0L)
  }

  test("decodeFeatures: batches never exceed BatchSize and cover every row") {
    val n = 100
    val big = (0L until n).map(i => (i, s"payload number $i with some words"))
      .toDF("doc_id", "text")
    val media = MediaOps.mediaTable(big).repartition(3).as[MediaOps.MediaRow]
    val feats = MediaOps.decodeFeatures(media).collect()
    assert(feats.length == n)
    assert(feats.map(_.media_id).toSet == (0L until n).toSet)
    assert(feats.forall(f => f.batch_size >= 1 && f.batch_size <= MediaOps.BatchSize))
  }

  test("decode rides the scan: no exchange in the physical plan") {
    val media = MediaOps.mediaTable(docs).as[MediaOps.MediaRow]
    val plan = MediaOps.decodeFeatures(media).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle in:\n$plan")
  }

  /** q110/q111 recomputed sequentially from the raw corpus text — the
    * same integer index arithmetic, executed with plain Scala string
    * indexing instead of Catalyst HOFs. */
  test("q110/q111: resize grid and frame sums equal a sequential byte-index reference") {
    val dir = "/root/testdata/sf0.001"
    val texts = Tables.load(spark, dir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    def w(id: Long) = 64 + (id % 8) * 16
    // Coverage first — without it the per-row checks are vacuous on a
    // regression that drops rows (a tightened guard, a changed mod
    // constant, an empty result).
    val resizeRows = SparkEntry.queries("q110_media_resize")(spark, dir).collect()
    assert(resizeRows.map(_.getAs[Long]("media_id")).toSet ==
      texts.keySet.filter(id => id % 3 == 0 && texts(id).length / w(id) >= 1))
    val frameRows = SparkEntry.queries("q111_media_frame_sample")(spark, dir).collect()
    val videoIds = texts.keySet.filter(id => id % 3 == 2 && texts(id).length / w(id) >= 1)
    assert(frameRows.map(_.getAs[Long]("media_id")).toSet == videoIds)
    assert(frameRows.groupBy(_.getAs[Long]("media_id")).values.forall(_.length == 4))
    resizeRows.foreach { r =>
      val id = r.getAs[Long]("media_id"); val t = texts(id)
      val (wi, hEff) = (w(id), t.length / w(id))
      assert(id % 3 == 0 && hEff >= 1)
      assert(r.getAs[Long]("w") == wi && r.getAs[Long]("h_eff") == hEff)
      val expect = (0 until 48).map { i =>
        t.charAt((((i / 8) * hEff / 6) * wi + (i % 8) * wi / 8).toInt).toInt
      }
      assert(r.getAs[String]("thumb") == expect.mkString(","))
      assert(r.getAs[Long]("thumb_sum") == expect.map(_.toLong).sum)
    }
    frameRows.foreach { r =>
      val id = r.getAs[Long]("media_id"); val t = texts(id)
      val (wi, f) = (w(id), t.length / w(id))
      assert(id % 3 == 2 && f >= 1)
      val j = r.getAs[Long]("frame_no")
      val fidx = j * f / 4
      assert(r.getAs[Long]("frame_idx") == fidx)
      val start = (fidx * wi).toInt
      assert(r.getAs[Long]("frame_sum") ==
        (start until start + wi.toInt).map(t.charAt(_).toLong).sum)
    }
  }

  test("Thumb8x6/ByteSliceSum: codegen and interpreted eval agree on random payloads") {
    import graft.plans.MediaSample
    val rnd = new scala.util.Random(110)
    val payloads = (0 until 150).map { i =>
      val n = rnd.nextInt(900) // includes empty and sub-grid payloads
      val b = new Array[Byte](n); rnd.nextBytes(b)
      val w = 1L + rnd.nextInt(96)
      (i.toLong, b, w, n.toLong / w)
    }
    val out = payloads.toDF("id", "payload", "w", "h")
      .select(col("id"),
        MediaSample.thumb8x6(col("payload"), col("w"), col("h")).as("t"),
        // start can go negative (h = 0) or past the end — pins the
        // out-of-range-reads-as-zero guard in both paths.
        MediaSample.byteSliceSum(col("payload"), col("w") * col("h") - lit(3L),
          col("w") + lit(7L)).as("s"))
      .collect().map(r => r.getLong(0) ->
        ((r.getStruct(1).getString(0), r.getStruct(1).getLong(1)), r.getLong(2))).toMap
    payloads.foreach { case (id, b, w, h) =>
      val ((thumb, sum), slice) = out(id)
      val (refThumb, refSum) = MediaSample.computeThumb(b, w, h)
      assert(thumb == refThumb && sum == refSum,
        s"thumb8x6 codegen diverges from computeThumb for payload $id")
      assert(slice == MediaSample.computeSliceSum(b, w * h - 3, w + 7),
        s"byteSliceSum codegen diverges from computeSliceSum for payload $id")
    }
  }
}
