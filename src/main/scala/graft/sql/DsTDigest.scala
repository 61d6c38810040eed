package graft.sql

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.tdigest.TDigestDouble
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** DataSketches t-digest — Druid's `tDigestSketch` extension
  * aggregator (druid-tdigest): a compact quantile sketch tuned for
  * extreme ranks, the last named extension-aggregator family after
  * theta/HLL/quantiles/frequent-items/tuple. Unlike the DoublesSketch
  * family there is NO exact regime to pin an oracle to — t-digest
  * quantiles interpolate between centroid means even below the
  * compression bound, and centroid layout depends on merge order — so
  * this family is SPEC-gated (rank-error tolerance + exact total
  * weight + library wire round-trip), the same posture as the
  * quantiles rollup-routing case, not registry-gated.
  */
object DsTDigest {
  private def heap(b: Array[Byte]): TDigestDouble =
    TDigestDouble.heapify(Memory.wrap(b))

  def quantile(b: Array[Byte], q: Double): Double = {
    if (b == null) return Double.NaN
    val sk = heap(b)
    if (sk.isEmpty) Double.NaN else sk.getQuantile(q)
  }

  def rank(b: Array[Byte], v: Double): Double = {
    if (b == null) return Double.NaN
    val sk = heap(b)
    if (sk.isEmpty) Double.NaN else sk.getRank(v)
  }

  def totalWeight(b: Array[Byte]): Long =
    if (b == null) 0L else heap(b).getTotalWeight

  def minValue(b: Array[Byte]): Double = {
    if (b == null) return Double.NaN
    val sk = heap(b)
    if (sk.isEmpty) Double.NaN else sk.getMinValue
  }

  def maxValue(b: Array[Byte]): Double = {
    if (b == null) return Double.NaN
    val sk = heap(b)
    if (sk.isEmpty) Double.NaN else sk.getMaxValue
  }
}

/** Build aggregate: `tdigest_agg(expr[, compression])`; BinaryType
  * children merge pre-built blobs (Druid's overload rule for
  * tDigestSketch over an already-sketched column).
  */
case class TDigestAgg(
    child: Expression,
    compression: Int = 100,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TDigestDouble]
  with UnaryLike[Expression] {

  require(compression >= 10 && compression <= Short.MaxValue,
    s"tdigest compression must be in [10, 32767]: $compression")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "tdigest_agg"

  override def createAggregationBuffer(): TDigestDouble =
    new TDigestDouble(compression.toShort)

  override def update(sk: TDigestDouble, input: InternalRow): TDigestDouble = {
    val v = child.eval(input)
    if (v != null) child.dataType match {
      case DoubleType  => sk.update(v.asInstanceOf[Double])
      case FloatType   => sk.update(v.asInstanceOf[Float].toDouble)
      case LongType    => sk.update(v.asInstanceOf[Long].toDouble)
      case IntegerType => sk.update(v.asInstanceOf[Int].toDouble)
      case ShortType   => sk.update(v.asInstanceOf[Short].toDouble)
      case BinaryType  =>
        val other = TDigestDouble.heapify(
          org.apache.datasketches.memory.Memory
            .wrap(v.asInstanceOf[Array[Byte]]))
        if (!other.isEmpty) sk.merge(other)
      case dt => throw new IllegalArgumentException(
        s"tdigest_agg cannot aggregate ${dt.catalogString}")
    }
    sk
  }

  override def merge(a: TDigestDouble, b: TDigestDouble): TDigestDouble = {
    if (!b.isEmpty) a.merge(b)
    a
  }

  override def eval(sk: TDigestDouble): Any = sk.toByteArray

  override def serialize(sk: TDigestDouble): Array[Byte] = sk.toByteArray
  override def deserialize(b: Array[Byte]): TDigestDouble =
    TDigestDouble.heapify(Memory.wrap(b))

  override def withNewMutableAggBufferOffset(o: Int): TDigestAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TDigestAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): TDigestAgg =
    copy(child = c)
}
