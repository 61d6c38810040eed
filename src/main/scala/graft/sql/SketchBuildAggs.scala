package graft.sql

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.quantiles.{DoublesSketch, DoublesUnion}
import org.apache.datasketches.theta.{SetOperation, Union}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst BUILD aggregates for the two DataSketches families
  * whose Druid SQL aggregators take raw values — `DS_THETA` /
  * `APPROX_COUNT_DISTINCT_DS_THETA` and `DS_QUANTILES_SKETCH` /
  * `APPROX_QUANTILE_DS`. The merge-side (pre-built blobs from a
  * segment's COMPLEX column) already exists as [[DsThetaUnionAgg]] /
  * [[DsQuantilesUnionAgg]]; these close the build side the same way
  * Spark's own `hll_sketch_agg` does for HLL: a
  * `TypedImperativeAggregate` whose buffer is the LIVE union object —
  * per-row cost is one sketch update, serialization happens only at
  * shuffle boundaries. (The BlobFoldAgg path would pay a compact
  * serialize per ROW if fed raw values; this is the
  * native-Expression-beats-UDF rung for sketch builds.)
  *
  * Both accept a BinaryType child too, treating values as pre-built
  * sketch blobs to merge — Druid's own overload resolution for DS_THETA
  * over an already-sketched column.
  */
case class ThetaSketchAgg(
    child: Expression,
    nominalEntries: Int = 4096,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union] with UnaryLike[Expression] {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "ds_theta"

  override def createAggregationBuffer(): Union =
    SetOperation.builder().setNominalEntries(nominalEntries).buildUnion()

  override def update(u: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) child.dataType match {
      case LongType    => u.update(v.asInstanceOf[Long])
      case IntegerType => u.update(v.asInstanceOf[Int].toLong)
      case ShortType   => u.update(v.asInstanceOf[Short].toLong)
      case DoubleType  => u.update(v.asInstanceOf[Double])
      case FloatType   => u.update(v.asInstanceOf[Float].toDouble)
      case StringType  => u.update(v.asInstanceOf[UTF8String].toString)
      case BinaryType  => u.union(Memory.wrap(v.asInstanceOf[Array[Byte]]))
      case dt => throw new IllegalArgumentException(
        s"ds_theta cannot aggregate ${dt.catalogString}")
    }
    u
  }

  override def merge(a: Union, b: Union): Union = {
    a.union(b.getResult(true, null)); a
  }

  /** Ordered compact bytes — the deterministic Druid wire shape. */
  override def eval(u: Union): Any = u.getResult(true, null).toByteArray

  override def serialize(u: Union): Array[Byte] =
    u.getResult(true, null).toByteArray
  override def deserialize(b: Array[Byte]): Union = {
    val u = createAggregationBuffer(); u.union(Memory.wrap(b)); u
  }

  override def withNewMutableAggBufferOffset(o: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): ThetaSketchAgg =
    copy(child = c)
}

/** Build a DoublesSketch (Druid `quantilesDoublesSketch`) from raw
  * numeric values; BinaryType children merge pre-built blobs.
  */
case class QuantilesSketchAgg(
    child: Expression,
    k: Int = 128,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[DoublesUnion] with UnaryLike[Expression] {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "ds_quantiles_sketch"

  override def createAggregationBuffer(): DoublesUnion =
    DoublesUnion.builder().setMaxK(k).build()

  override def update(u: DoublesUnion, input: InternalRow): DoublesUnion = {
    val v = child.eval(input)
    if (v != null) child.dataType match {
      case DoubleType  => u.update(v.asInstanceOf[Double])
      case FloatType   => u.update(v.asInstanceOf[Float].toDouble)
      case LongType    => u.update(v.asInstanceOf[Long].toDouble)
      case IntegerType => u.update(v.asInstanceOf[Int].toDouble)
      case ShortType   => u.update(v.asInstanceOf[Short].toDouble)
      case BinaryType  =>
        u.union(DoublesSketch.wrap(Memory.wrap(v.asInstanceOf[Array[Byte]])))
      case dt => throw new IllegalArgumentException(
        s"ds_quantiles_sketch cannot aggregate ${dt.catalogString}")
    }
    u
  }

  override def merge(a: DoublesUnion, b: DoublesUnion): DoublesUnion = {
    a.union(b.getResult); a
  }

  override def eval(u: DoublesUnion): Any = u.getResult.toByteArray(true)

  override def serialize(u: DoublesUnion): Array[Byte] =
    u.getResult.toByteArray(true)
  override def deserialize(b: Array[Byte]): DoublesUnion = {
    val u = createAggregationBuffer()
    u.union(DoublesSketch.wrap(Memory.wrap(b)))
    u
  }

  override def withNewMutableAggBufferOffset(o: Int): QuantilesSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): QuantilesSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): QuantilesSketchAgg =
    copy(child = c)
}

/** Build a DataSketches Frequent-Items sketch (heavy hitters /
  * Misra-Gries family) over string values — the third DataSketches
  * family, closing the build side for top-frequency analysis the same
  * way [[ThetaSketchAgg]]/[[QuantilesSketchAgg]] do for distincts and
  * quantiles. BinaryType children merge pre-built blobs.
  *
  * Scale contract: per-partition memory is bounded by `maxMapSize`
  * (power of 2) REGARDLESS of stream cardinality, and the shuffle
  * carries one ~maxMapSize-entry blob per group per partition instead
  * of the full item histogram — the heavy-hitters shape for a
  * billion-token vocabulary. While the stream's distinct count stays
  * under the purge threshold the sketch is EXACT
  * (`getMaximumError == 0`), which is what makes the oracle gate
  * deterministic; above it, estimates carry the documented
  * Misra-Gries error bound. The reference has no frequency sketches
  * at all (Complex columns error out, src/column/mod.rs:59-61).
  */
case class FreqItemsSketchAgg(
    child: Expression,
    maxMapSize: Int = 1024,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[
    org.apache.datasketches.frequencies.ItemsSketch[String]]
  with UnaryLike[Expression] {

  private type Sk = org.apache.datasketches.frequencies.ItemsSketch[String]
  private def serde = new org.apache.datasketches.common.ArrayOfStringsSerDe

  require(maxMapSize >= 8 && (maxMapSize & (maxMapSize - 1)) == 0,
    s"ds_freq maxMapSize must be a power of 2 >= 8: $maxMapSize")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "ds_freq"

  override def createAggregationBuffer(): Sk = new Sk(maxMapSize)

  override def update(sk: Sk, input: InternalRow): Sk = {
    val v = child.eval(input)
    if (v != null) child.dataType match {
      case StringType => sk.update(v.asInstanceOf[UTF8String].toString)
      case BinaryType => sk.merge(
        org.apache.datasketches.frequencies.ItemsSketch.getInstance(
          Memory.wrap(v.asInstanceOf[Array[Byte]]), serde))
      case dt => throw new IllegalArgumentException(
        s"ds_freq cannot aggregate ${dt.catalogString} (string or sketch blob)")
    }
    sk
  }

  override def merge(a: Sk, b: Sk): Sk = { a.merge(b); a }

  override def eval(sk: Sk): Any = sk.toByteArray(serde)

  override def serialize(sk: Sk): Array[Byte] = sk.toByteArray(serde)
  override def deserialize(b: Array[Byte]): Sk =
    org.apache.datasketches.frequencies.ItemsSketch.getInstance(
      Memory.wrap(b), serde)

  override def withNewMutableAggBufferOffset(o: Int): FreqItemsSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): FreqItemsSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): FreqItemsSketchAgg =
    copy(child = c)
}
