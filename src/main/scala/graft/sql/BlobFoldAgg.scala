package graft.sql

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Shared shape of the sketch-blob merge aggregators (theta union,
  * quantiles union, …): input blobs buffer and fold through ONE pass of
  * the family's native union per batch of 256 (and once at finish),
  * instead of deserialize + re-union + re-serialize per row — per-group
  * cost O(rows), not O(rows x retained). Folding must be associative
  * and fold-structure independent (every DataSketches union is). The
  * typed-aggregator buffer lives as an object between updates
  * (TypedImperativeAggregate); kryo only runs at shuffle boundaries.
  */
abstract class BlobFoldAgg extends Aggregator[Array[Byte],
    scala.collection.mutable.ArrayBuffer[Array[Byte]], Array[Byte]] {
  protected type Buf = scala.collection.mutable.ArrayBuffer[Array[Byte]]

  /** One native union pass over many blobs. */
  protected def foldAll(bs: Seq[Array[Byte]]): Array[Byte]
  /** Result for a group whose inputs were all null/absent. */
  protected def onEmpty: Array[Byte]

  private val foldAt = 256
  private def foldInPlace(b: Buf): Buf = {
    val folded = foldAll(b.toSeq)
    b.clear()
    b += folded
  }
  final def zero: Buf = scala.collection.mutable.ArrayBuffer.empty
  final def reduce(b: Buf, v: Array[Byte]): Buf =
    if (v == null) b
    else { b += v; if (b.length >= foldAt) foldInPlace(b) else b }
  final def merge(a: Buf, b: Buf): Buf = {
    a ++= b
    if (a.length >= foldAt) foldInPlace(a) else a
  }
  final def finish(r: Buf): Array[Byte] =
    if (r.isEmpty) onEmpty else foldAll(r.toSeq)
  final def bufferEncoder: Encoder[scala.collection.mutable.ArrayBuffer[Array[Byte]]] =
    Encoders.kryo[scala.collection.mutable.ArrayBuffer[Array[Byte]]]
  final def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}
