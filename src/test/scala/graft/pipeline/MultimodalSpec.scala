package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "en", "abcdefghij"),          // frames = 1 + 0%3 = 1
    (1L, "de", "0123456789abcdef"),    // frames = 2
    (2L, "en", "xyz"),                 // frames = 3
    (3L, "fr", "")                     // frames = 1, empty payload
  ).toDF("doc_id", "lang", "text")

  test("frame sampling keeps every Nth frame with contiguous slices") {
    val all = Multimodal.sampleFrames(docs, everyN = 1).collect()
    // fan-out: 1 + 2 + 3 + 1 frames
    assert(all.length == 7)
    // slices of one doc reassemble to the payload (no gaps, no overlap)
    val doc1 = all.filter(_.doc_id == 1L).sortBy(_.frame_idx)
    assert(doc1.flatMap(_.data).map(_.toChar).mkString == "0123456789abcdef")
    val sampled = Multimodal.sampleFrames(docs, everyN = 2).collect()
    // ceil(frames/2): 1, 1, 2, 1
    assert(sampled.length == 5)
    assert(sampled.forall(_.frame_idx % 2 == 0))
  }

  test("resize fixes every frame to exactly w*h bytes") {
    val resized = Multimodal.resizeFrames(
      Multimodal.sampleFrames(docs, 1), 8, 8).collect()
    assert(resized.nonEmpty && resized.forall(_.data.length == 64))
    // truncation keeps a prefix; padding appends zeros
    val doc0 = resized.find(_.doc_id == 0L).get
    assert(doc0.data.take(10).map(_.toChar).mkString == "abcdefghij")
    assert(doc0.data.drop(10).forall(_ == 0))
  }

  test("features are deterministic, unit-norm, and partition-invariant") {
    def run(parts: Int): Map[(Long, Int), Seq[Float]] =
      Multimodal.extractFeatures(
          Multimodal.sampleFrames(docs.repartition(parts), 1), dim = 16)
        .collect()
        .map(f => (f.doc_id, f.frame_idx) -> f.feature.toSeq).toMap
    val a = run(1)
    val b = run(4)
    assert(a == b, "feature values depend on partitioning")
    for ((k, feat) <- a) {
      val norm = math.sqrt(feat.map(x => x.toDouble * x).sum)
      assert(math.abs(norm - 1.0) < 1e-5 || norm == 0.0,
        s"frame $k norm=$norm")
    }
  }

  test("empty payload frames yield the zero vector, not NaN") {
    val feats = Multimodal.extractFeatures(
      Multimodal.sampleFrames(docs.filter(col("doc_id") === 3L), 1), 16)
      .collect()
    assert(feats.length == 1)
    assert(feats.head.feature.forall(f => f == 0f && !f.isNaN))
  }
}
