package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: treat image/audio/video payloads as
  * opaque `binary` columns plus typed metadata, processed batchwise per
  * partition.
  *
  * The real Spark shape is here — binary columns, typed Dataset
  * encoders, per-partition batch iteration (the JVM analogue of
  * `mapInPandas` batches), explicit output schema — while the actual
  * media decode is a STUB: this container ships no image/audio codecs,
  * so `decodeStub` derives deterministic fake metadata from the payload
  * bytes. Swapping in a real decoder (JNI/FFI or a Python worker via
  * mapInPandas at deploy time) changes ONE function, not the pipeline.
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, lang: String, payload: Array[Byte])
  final case class MediaMeta(doc_id: Long, lang: String,
                             width: Int, height: Int, frames: Int, bytes: Int)

  /** STUB decode — deterministic fake in lieu of a real media codec. */
  def decodeStub(r: MediaRow): MediaMeta = MediaMeta(
    doc_id = r.doc_id,
    lang = r.lang,
    width = r.payload.length % 64,
    height = (r.payload.length / 64) % 64,
    frames = (1 + r.doc_id % 3).toInt,
    bytes = r.payload.length)

  /** documents -> fake binary payloads -> per-partition batch decode ->
    * typed metadata. Partition-parallel, no shuffle until the caller
    * aggregates.
    */
  def extractMetadata(docs: DataFrame): Dataset[MediaMeta] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("lang"),
        encode(col("text"), "UTF-8").as("payload"))
      .as[MediaRow]
      .mapPartitions(rows => rows.map(decodeStub)) // batchwise stub decode
  }

  final case class Frame(doc_id: Long, lang: String, frame_idx: Int,
                         data: Array[Byte])
  final case class FrameFeature(doc_id: Long, lang: String, frame_idx: Int,
                                feature: Array[Float])

  /** Frame sampling: each payload splits into its `frames` equal byte
    * slices (the stub's stand-in for video frame extraction) and every
    * `everyN`-th frame is kept. flatMap keeps it partition-parallel and
    * row-bounded — a doc fans out to at most ceil(frames/everyN) rows,
    * never materializing all frames of a partition at once.
    */
  def sampleFrames(docs: DataFrame, everyN: Int): Dataset[Frame] = {
    require(everyN > 0, s"everyN must be positive: $everyN")
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("lang"),
        encode(col("text"), "UTF-8").as("payload"))
      .as[MediaRow]
      .flatMap { r =>
        val n = decodeStub(r).frames
        val len = r.payload.length
        (0 until n by everyN).map { i =>
          val from = (i.toLong * len / n).toInt
          val until = ((i + 1).toLong * len / n).toInt
          Frame(r.doc_id, r.lang, i,
            java.util.Arrays.copyOfRange(r.payload, from, until))
        }
      }
  }

  /** STUB resize: normalize every frame to exactly `w*h` bytes
    * (truncate or zero-pad) — the fixed-output-shape contract a real
    * resize kernel would satisfy, so downstream stages can assume a
    * constant per-frame size.
    */
  def resizeFrames(frames: Dataset[Frame], w: Int, h: Int): Dataset[Frame] = {
    require(w > 0 && h > 0, s"bad target size ${w}x$h")
    val spark = frames.sparkSession
    import spark.implicits._
    frames.map(f => f.copy(data = java.util.Arrays.copyOf(f.data, w * h)))
  }

  /** Feature extraction: byte-value histogram folded into `dim`
    * buckets, L2-normalized — deterministic and cheap, but a REAL
    * (if crude) content feature, unlike the metadata stub. Zero-byte
    * frames yield the zero vector.
    */
  def extractFeatures(frames: Dataset[Frame], dim: Int): Dataset[FrameFeature] = {
    require(dim > 0, s"feature dim must be positive: $dim")
    val spark = frames.sparkSession
    import spark.implicits._
    frames.map { f =>
      val hist = new Array[Float](dim)
      var i = 0
      while (i < f.data.length) {
        hist((f.data(i) & 0xff) % dim) += 1f
        i += 1
      }
      val norm = math.sqrt(hist.map(x => x.toDouble * x).sum)
      if (norm > 0) {
        var j = 0
        while (j < dim) { hist(j) = (hist(j) / norm).toFloat; j += 1 }
      }
      FrameFeature(f.doc_id, f.lang, f.frame_idx, hist)
    }
  }

  final case class AudioChunk(doc_id: Long, chunk_idx: Long, energy: Long,
                              peak: Int)

  /** Audio-style chunking over the stub waveform (the text's char
    * codes stand in for PCM samples — a real decoder swaps the sample
    * extraction, not the chunking): fixed `win`-sample windows every
    * `hop` samples (overlapping when hop < win; trailing partial
    * windows dropped), each carrying integer energy (sum of squared
    * samples) and peak — the inputs of VAD-style silence gating.
    * A flatMap keeps it partition-parallel and row-bounded (a doc fans
    * out to at most len/hop chunk rows, never a materialized window
    * matrix); nothing shuffles until the caller aggregates, and the
    * integer arithmetic is exact cross-engine.
    */
  def chunkAudio(docs: DataFrame, win: Int, hop: Int): Dataset[AudioChunk] = {
    require(win > 0 && hop > 0, s"win/hop must be positive: $win/$hop")
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .flatMap { case (id, text) =>
        if (text.length < win) Iterator.empty
        else (0 to text.length - win by hop).iterator.zipWithIndex
          .map { case (st, i) =>
            var e = 0L
            var pk = 0
            var j = st
            while (j < st + win) {
              val v = text.charAt(j).toInt
              e += v.toLong * v
              if (v > pk) pk = v
              j += 1
            }
            AudioChunk(id, i.toLong, e, pk)
          }
      }
  }
}
