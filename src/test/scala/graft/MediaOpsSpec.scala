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
}
