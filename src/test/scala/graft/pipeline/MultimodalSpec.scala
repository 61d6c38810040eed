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

  test("audio chunking: window math, exact energies, partition invariance") {
    // "aaaa aaaa aa" — known char codes: 'a'=97, ' '=32
    val a = Seq((10L, "en", "aaaa aaaa aa")).toDF("doc_id", "lang", "text")
    // win=4 hop=2, len=12 -> starts 0,2,4,6,8: 5 chunks
    val chunks = Multimodal.chunkAudio(a, win = 4, hop = 2)
      .collect().sortBy(_.chunk_idx)
    assert(chunks.length == 5)
    assert(chunks.map(_.chunk_idx).toSeq == Seq(0L, 1L, 2L, 3L, 4L))
    // chunk 0 = "aaaa": 4*97^2; chunk 1 = "aa a" wait — verify directly
    val text = "aaaa aaaa aa"
    chunks.foreach { c =>
      val st = c.chunk_idx.toInt * 2
      val want = (st until st + 4).map(j =>
        text(j).toInt.toLong * text(j).toInt).sum
      assert(c.energy == want, s"chunk ${c.chunk_idx}")
      assert(c.peak == (st until st + 4).map(text(_).toInt).max)
    }
    // docs shorter than the window emit nothing; exact-length docs one
    val edge = Seq((20L, "en", "abc"), (21L, "en", "abcd"))
      .toDF("doc_id", "lang", "text")
    val ec = Multimodal.chunkAudio(edge, win = 4, hop = 2).collect()
    assert(ec.map(_.doc_id).toSeq == Seq(21L) && ec.head.chunk_idx == 0L)
    // partition-invariant
    val big = (0L until 50L).map(i => (i, "en", ("x" * (i % 30).toInt) + "hello world"))
      .toDF("doc_id", "lang", "text")
    def run(parts: Int) = Multimodal.chunkAudio(big.repartition(parts), 8, 3)
      .collect().map(c => (c.doc_id, c.chunk_idx) -> (c.energy, c.peak)).toMap
    assert(run(1) == run(5))
  }

  test("audioNearDup: banded candidates find every close pair; cap replayed") {
    // tracks: 0 and 1 identical (dist 0); 2 differs by one char in the
    // first window (small dist, same quantized band); 3 far off
    val base = "the quick brown fox jumps over the lazy dog " * 8 // 352 chars
    val tweaked = "thf" + base.drop(3) // +1 on one sample in chunk 0
    val far = base.toUpperCase
    val a = Seq(
      (0L, "en", base), (1L, "en", base), (2L, "en", tweaked),
      (3L, "en", far))
      .toDF("doc_id", "lang", "text")
    val pairs = Multimodal.audioNearDup(a, maxEnergyDist = 20000L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val m = pairs.map(p => (p._1, p._2) -> p._3).toMap
    assert(m.get((0L, 1L)).contains(0L), s"identical tracks: $m")
    // the tweak shifts chunk-0 energy by 102^2-101^2=203 per overlap
    // window; all four windows still band-match and the pair confirms
    assert(m.contains((0L, 2L)) && m((0L, 2L)) > 0L, s"near pair: $m")
    assert(!m.keySet.exists(k => k._1 == 3L || k._2 == 3L),
      s"far track must not pair: $m")
    // deterministic across partitioning
    val pairs2 = Multimodal.audioNearDup(a.repartition(7),
      maxEnergyDist = 20000L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(pairs2 == pairs.toSet)
    // a hot band (65 identical tracks) generates no candidates through
    // it under the default cap, and the cap lifts when raised
    val hot = (100L until 165L).map(i => (i, "en", base))
      .toDF("doc_id", "lang", "text")
    assert(Multimodal.audioNearDup(hot, maxEnergyDist = 0L).count() == 0L)
    assert(Multimodal.audioNearDup(hot, maxEnergyDist = 0L,
      maxBucket = 100).count() == 65L * 64 / 2)
  }

  private def fixture(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/fixtures/$name")
    assert(in != null, s"missing fixture $name")
    try in.readAllBytes() finally in.close()
  }

  test("PNG fixture decodes byte-exactly through the real codec") {
    // the checked-in 8x5 RGB PNG's pixels follow a known formula:
    // r=(x*30)%256, g=(y*50)%256, b=(x*y*7)%256
    val png = fixture("test.png")
    assert(MediaCodec.sniff(png) == MediaCodec.Image)
    val (w, h, argb) = MediaCodec.decodeArgb(png).get
    assert((w, h) == ((8, 5)))
    for (y <- 0 until h; x <- 0 until w) {
      val want = 0xff000000 | ((x * 30) % 256 << 16) |
        ((y * 50) % 256 << 8) | ((x * y * 7) % 256)
      assert(argb(y * w + x) == want, s"pixel ($x,$y)")
    }
    // decodeMedia routes it through the REAL decoder
    val meta = Multimodal.decodeMedia(
      Multimodal.MediaRow(7L, "en", png))
    assert(meta.width == 8 && meta.height == 5 && meta.frames == 1 &&
      meta.bytes == png.length)
  }

  test("JPEG fixture decodes byte-exactly through the real codec") {
    // checked-in 16x9 solid (200,120,40) JPEG — the most common real
    // image format must not fall to the stub. A flat color survives
    // JPEG's DCT as one uniform decoded value: the JDK decoder yields
    // 0xffc97829 for EVERY pixel (pinned, with the full-raster CRC)
    val jpg = fixture("test.jpg")
    assert((jpg(0) & 0xff) == 0xff && (jpg(1) & 0xff) == 0xd8)
    assert(MediaCodec.sniff(jpg) == MediaCodec.Image,
      "JPEG SOI magic not recognized — payload would take the stub path")
    val (w, h, argb) = MediaCodec.decodeArgb(jpg).get
    assert((w, h) == ((16, 9)))
    assert(argb.forall(_ == 0xffc97829), "JPEG raster not uniform")
    val crc = new java.util.zip.CRC32()
    argb.foreach { p =>
      crc.update(p >> 24); crc.update(p >> 16); crc.update(p >> 8); crc.update(p)
    }
    assert(crc.getValue == 3099527875L)
    // decodeMedia routes it through the REAL decoder
    val meta = Multimodal.decodeMedia(Multimodal.MediaRow(9L, "en", jpg))
    assert(meta.width == 16 && meta.height == 9 && meta.frames == 1 &&
      meta.bytes == jpg.length)
  }

  test("WAV fixture decodes byte-exactly and chunks with real samples") {
    // checked-in PCM16 mono 8000 Hz WAV: sample i = ((i*257)%2003)-1001
    val wav = fixture("test.wav")
    assert(MediaCodec.sniff(wav) == MediaCodec.Wav)
    val d = MediaCodec.decodeWav(wav).get
    assert(d.sampleRate == 8000 && d.channels == 1 && d.samples.length == 64)
    val want = (0 until 64).map(i => ((i * 257) % 2003) - 1001)
    assert(d.samples.toSeq == want)
    // chunkWav over the real samples: hand-computed window energies
    val media = Seq((42L, wav)).toDF("doc_id", "payload")
    val chunks = Multimodal.chunkWav(media, win = 16, hop = 8)
      .collect().sortBy(_.chunk_idx)
    assert(chunks.length == (64 - 16) / 8 + 1)
    chunks.foreach { c =>
      val st = c.chunk_idx.toInt * 8
      val wsl = want.slice(st, st + 16)
      assert(c.energy == wsl.map(v => v.toLong * v).sum, s"chunk ${c.chunk_idx}")
      assert(c.peak == math.max(0, wsl.max), s"peak ${c.chunk_idx}")
    }
    // a non-WAV payload falls back to unsigned byte samples (loudly
    // documented fallback), not an exception
    val fb = Multimodal.chunkWav(
      Seq((1L, "abcdefghij".getBytes("UTF-8"))).toDF("doc_id", "payload"),
      win = 4, hop = 2).collect()
    assert(fb.nonEmpty && fb.head.energy ==
      "abcd".map(ch => ch.toLong * ch).sum)
  }

  test("text payloads keep riding the synthetic path (oracle gates unchanged)") {
    // decode dispatch must NOT reroute text-derived payloads: the
    // m1/m2 oracles replay the synthetic arithmetic
    val rows = Seq(
      Multimodal.MediaRow(0L, "en", "plain text doc".getBytes("UTF-8")),
      // "BM"-prefixed TEXT sniffs as a BMP candidate but fails the
      // real decode -> stub fallback, not an error
      Multimodal.MediaRow(1L, "en", "BMW is a carmaker".getBytes("UTF-8")),
      Multimodal.MediaRow(2L, "en", "GIF89a-like but text".getBytes("UTF-8")))
    rows.foreach { r =>
      assert(Multimodal.decodeMedia(r) == Multimodal.decodeStub(r),
        s"doc ${r.doc_id} left the synthetic path")
    }
  }
}
