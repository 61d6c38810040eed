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
}
