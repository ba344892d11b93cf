package graft

import java.security.MessageDigest

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal

/** Multimodal plumbing: payload/metadata synthesis, typed mapPartitions
  * feature extraction (stub decoder), resize and frame-sampling stubs.
  */
class MultimodalSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def docs = Seq(
    (0L, "alpha beta"), (1L, "gamma"), (2L, "delta epsilon zeta"),
    (3L, "eta"), (4L, "theta iota")).toDF("doc_id", "text")

  private def sha256hex(s: String): String =
    MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes("UTF-8")).map(b => f"${b & 0xff}%02x").mkString

  test("attachMedia: deterministic payload = 3-byte tag + sha256(text)") {
    val m = Multimodal.attachMedia(docs)
    val r = m.filter($"doc_id" === 1L)
      .select($"kind", $"payload", $"width", $"sample_rate")
      .collect().head
    assert(r.getString(0) == "audio") // 1 % 3 = 1 → audio
    val payload = r.getAs[Array[Byte]](1)
    assert(payload.length == 35)
    assert(new String(payload.take(3), "UTF-8") == "AUD")
    assert(payload.drop(3).map(b => f"${b & 0xff}%02x").mkString ==
      sha256hex("gamma"))
    assert(r.getInt(2) == 17 && r.getInt(3) == 12000)
  }

  test("extractFeatures: stub decode through typed mapPartitions") {
    val f = Multimodal.extractFeatures(Multimodal.attachMedia(docs))
      .collect().map(x => x.doc_id -> x).toMap
    assert(f(1L).sig8 == sha256hex("gamma").take(8))
    assert(f(1L).byte_len == 35L)
    val expectedMean = {
      val p = "AUD".getBytes("UTF-8") ++
        MessageDigest.getInstance("SHA-256").digest("gamma".getBytes("UTF-8"))
      p.map(b => (b & 0xff).toDouble).sum / p.length
    }
    assert(math.abs(f(1L).mean_byte - expectedMean) < 1e-12)
  }

  test("extractFeatures preserves partitioning (batch shape)") {
    val media = Multimodal.attachMedia(docs).repartition(4)
    val out = Multimodal.extractFeatures(media)
    assert(out.rdd.getNumPartitions == 4)
  }

  test("resize halves dimensions with floor at 1") {
    val m = Multimodal.attachMedia(docs)
    val before = m.select($"doc_id", $"width", $"height")
      .as[(Long, Int, Int)].collect()
      .map { case (k, w, h) => k -> ((w, h)) }.toMap
    val after = Multimodal.resize(m).select($"doc_id", $"width", $"height")
      .as[(Long, Int, Int)].collect()
    after.foreach { case (id, w, h) =>
      assert(w == math.max(before(id)._1 / 2, 1))
      assert(h == math.max(before(id)._2 / 2, 1))
    }
  }

  test("sampleFrames: bounded count, monotone in-payload offsets") {
    val frames = Multimodal.sampleFrames(Multimodal.attachMedia(docs))
      .as[(Long, Long, Long)].collect().groupBy(_._1)
    assert(frames.nonEmpty)
    frames.foreach { case (_, fs) =>
      assert(fs.length >= 1 && fs.length <= 8)
      val offs = fs.sortBy(_._2).map(_._3).toSeq
      assert(offs.forall(o => o >= 3 && o < 35))
      assert(offs == offs.sorted)
    }
  }
}
