package graft.sql

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.tuple.arrayofdoubles.{
  ArrayOfDoublesCombiner, ArrayOfDoublesCompactSketch,
  ArrayOfDoublesSetOperationBuilder, ArrayOfDoublesSketch,
  ArrayOfDoublesSketches, ArrayOfDoublesUnion, ArrayOfDoublesUpdatableSketch,
  ArrayOfDoublesUpdatableSketchBuilder}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** DataSketches Tuple sketches over double arrays — Druid's
  * `arrayOfDoublesSketch` extension aggregator family (datasketches-
  * contrib): a theta sketch whose retained keys each carry a vector of
  * double values, values for colliding keys combined by SUM. One pass
  * gives a distinct-count estimate AND per-metric sums over the
  * distinct keys — the "unique users + their summed revenue" shape.
  * The reference errors on every Complex column (src/column/mod.rs:
  * 59-61) and has no aggregator layer at all; this is beyond-parity
  * surface, same class as the theta/HLL/quantiles/frequent-items
  * families already in.
  *
  * Determinism contract (what makes the dr gate hash-exact): in the
  * exact regime (distinct keys <= nominalEntries, theta == 1) the
  * estimate IS the distinct count and each metrics sum is the true
  * per-column sum over all rows; with INTEGER-VALUED doubles the sum
  * is order-independent (exact integer arithmetic below 2^53), so
  * Spark's partial-aggregation order vs DuckDB's scan order cannot
  * diverge. Past nominalEntries the same plan degrades to the
  * documented theta-scaled estimates instead of failing.
  */
object DsTuple {

  /** Druid's intersection combiner for arrayOfDoublesSketch: sum. */
  private val sumCombiner: ArrayOfDoublesCombiner =
    new ArrayOfDoublesCombiner {
      override def combine(a: Array[Double], b: Array[Double]): Array[Double] = {
        val out = new Array[Double](a.length)
        var i = 0
        while (i < a.length) { out(i) = a(i) + b(i); i += 1 }
        out
      }
    }

  private def heap(b: Array[Byte]): ArrayOfDoublesSketch =
    ArrayOfDoublesSketches.heapifySketch(Memory.wrap(b))

  /** Distinct-key estimate (exact while theta == 1). */
  def estimate(b: Array[Byte]): Double =
    if (b == null) 0.0 else heap(b).getEstimate

  /** Retained (key, values) entry count. */
  def numEntries(b: Array[Byte]): Long =
    if (b == null) 0L else heap(b).getRetainedEntries.toLong

  /** Druid's arrayOfDoublesSketchToMetricsSumEstimate: per-column sum
    * of the retained values divided by theta (exact sums while
    * theta == 1).
    */
  def metricsSum(b: Array[Byte]): Array[Double] = {
    if (b == null) return Array.empty
    val sk = heap(b)
    val out = new Array[Double](sk.getNumValues)
    val it = sk.iterator()
    while (it.next()) {
      val vs = it.getValues
      var i = 0
      while (i < out.length) { out(i) += vs(i); i += 1 }
    }
    val theta = sk.getTheta
    if (theta < 1.0) { var i = 0; while (i < out.length) { out(i) /= theta; i += 1 } }
    out
  }

  private def setOpBuilder(a: ArrayOfDoublesSketch, nominalEntries: Int) =
    new ArrayOfDoublesSetOperationBuilder()
      .setNominalEntries(nominalEntries)
      .setNumberOfValues(a.getNumValues)

  def unionBytes(x: Array[Byte], y: Array[Byte], nominalEntries: Int): Array[Byte] = {
    if (x == null) return y
    if (y == null) return x
    val a = heap(x)
    val u = setOpBuilder(a, nominalEntries).buildUnion()
    u.union(a); u.union(heap(y))
    u.getResult.toByteArray
  }

  def intersectBytes(x: Array[Byte], y: Array[Byte], nominalEntries: Int): Array[Byte] = {
    require(x != null && y != null, "ds_tuple_intersect over null sketch")
    val a = heap(x)
    val i = setOpBuilder(a, nominalEntries).buildIntersection()
    i.intersect(a, sumCombiner); i.intersect(heap(y), sumCombiner)
    i.getResult.toByteArray
  }

  def aNotBBytes(x: Array[Byte], y: Array[Byte]): Array[Byte] = {
    require(x != null && y != null, "ds_tuple_not over null sketch")
    val a = heap(x)
    val d = setOpBuilder(a, 1 << 26).buildAnotB()
    d.update(a, heap(y))
    d.getResult.toByteArray
  }

  /** Aggregation buffer: raw rows land in an updatable sketch; blob
    * inputs and buffer merges go through a lazily-built union. `result`
    * folds the updatable side into the union exactly once — tuple
    * UNION SUMS values for shared keys, so a second fold would
    * double-count (the flag makes result idempotent; the aggregate
    * contract never updates a buffer after eval/serialize).
    */
  final class TupleBuf(val nominalEntries: Int, val emptyArity: Int = 1) {
    private var upd: ArrayOfDoublesUpdatableSketch = null
    private var un: ArrayOfDoublesUnion = null
    private var folded = false

    def updateRow(key: Any, keyType: DataType, vals: Array[Double]): Unit = {
      require(!folded, "tuple buffer updated after finalization")
      if (upd == null)
        upd = new ArrayOfDoublesUpdatableSketchBuilder()
          .setNominalEntries(nominalEntries)
          .setNumberOfValues(vals.length).build()
      keyType match {
        case LongType    => upd.update(key.asInstanceOf[Long], vals)
        case IntegerType => upd.update(key.asInstanceOf[Int].toLong, vals)
        case ShortType   => upd.update(key.asInstanceOf[Short].toLong, vals)
        case DoubleType  => upd.update(key.asInstanceOf[Double], vals)
        case FloatType   => upd.update(key.asInstanceOf[Float].toDouble, vals)
        case StringType  => upd.update(key.asInstanceOf[UTF8String].toString, vals)
        case dt => throw new IllegalArgumentException(
          s"ds_tuple key type ${dt.catalogString} unsupported")
      }
    }

    def mergeSketch(s: ArrayOfDoublesSketch): Unit = {
      require(!folded, "tuple buffer merged after finalization")
      // an empty sketch contributes nothing, and its (default-1)
      // numValues must never size the union — tuple unions require a
      // consistent value count
      if (s.isEmpty) return
      if (un == null)
        un = new ArrayOfDoublesSetOperationBuilder()
          .setNominalEntries(nominalEntries)
          .setNumberOfValues(s.getNumValues).buildUnion()
      un.union(s)
    }

    def result: ArrayOfDoublesCompactSketch = {
      if (un == null) {
        if (upd == null)
          // empty group: an empty sketch sized to the DECLARED metric
          // arity — a numberOfValues=1 default would make
          // ds_tuple_metrics_sum on an all-null group return a
          // 1-element array, so element_at(sums, 2) of a 2-metric
          // aggregate would be null instead of 0.0
          upd = new ArrayOfDoublesUpdatableSketchBuilder()
            .setNominalEntries(nominalEntries)
            .setNumberOfValues(emptyArity).build()
        upd.compact()
      } else {
        if (!folded && upd != null) { un.union(upd.compact()); folded = true }
        un.getResult
      }
    }
  }
}

/** Build aggregate: `ds_tuple(key, array<double> metrics
  * [, nominalEntries])` — per-row one sketch update, serialization only
  * at shuffle boundaries (the same TypedImperativeAggregate shape as
  * the theta/quantiles/freq builders).
  */
case class TupleSketchAgg(
    left: Expression,
    right: Expression,
    nominalEntries: Int = 16384,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[DsTuple.TupleBuf]
  with BinaryLike[Expression] {

  require(nominalEntries >= 16 && (nominalEntries & (nominalEntries - 1)) == 0,
    s"ds_tuple nominalEntries must be a power of 2 >= 16: $nominalEntries")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "ds_tuple"

  // metric arity for the empty-group sketch: statically known when
  // the metrics expression is a literal array constructor (the
  // ds_tuple(key, array(m1, m2, ...)) surface form)
  private lazy val staticArity: Int = right match {
    case ca: org.apache.spark.sql.catalyst.expressions.CreateArray =>
      math.max(1, ca.children.size)
    case _ => 1
  }

  override def createAggregationBuffer(): DsTuple.TupleBuf =
    new DsTuple.TupleBuf(nominalEntries, staticArity)

  override def update(buf: DsTuple.TupleBuf, input: InternalRow): DsTuple.TupleBuf = {
    val k = left.eval(input)
    if (k != null) {
      val m = right.eval(input)
      if (m != null) {
        val arr = m.asInstanceOf[ArrayData]
        val vals = new Array[Double](arr.numElements())
        var i = 0
        while (i < vals.length) {
          // null metric elements count as 0, Druid's numeric-null fold
          if (!arr.isNullAt(i)) vals(i) = arr.getDouble(i)
          i += 1
        }
        buf.updateRow(k, left.dataType, vals)
      }
    }
    buf
  }

  override def merge(a: DsTuple.TupleBuf, b: DsTuple.TupleBuf): DsTuple.TupleBuf = {
    a.mergeSketch(b.result); a
  }

  override def eval(buf: DsTuple.TupleBuf): Any = buf.result.toByteArray

  override def serialize(buf: DsTuple.TupleBuf): Array[Byte] =
    buf.result.toByteArray
  override def deserialize(b: Array[Byte]): DsTuple.TupleBuf = {
    val buf = createAggregationBuffer()
    buf.mergeSketch(
      org.apache.datasketches.tuple.arrayofdoubles.ArrayOfDoublesSketches
        .heapifySketch(org.apache.datasketches.memory.Memory.wrap(b)))
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): TupleSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TupleSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): TupleSketchAgg = copy(left = l, right = r)
}

/** Merge aggregate over pre-built tuple sketch blobs (Druid's
  * `arrayOfDoublesSketch` aggregator without `metricColumns` — the
  * rollup / re-aggregation path over a COMPLEX column).
  */
case class TupleUnionAgg(
    child: Expression,
    nominalEntries: Int = 16384,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[DsTuple.TupleBuf]
  with UnaryLike[Expression] {

  require(nominalEntries >= 16 && (nominalEntries & (nominalEntries - 1)) == 0,
    s"ds_tuple_merge nominalEntries must be a power of 2 >= 16: $nominalEntries")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "ds_tuple_merge"

  override def createAggregationBuffer(): DsTuple.TupleBuf =
    new DsTuple.TupleBuf(nominalEntries)

  override def update(buf: DsTuple.TupleBuf, input: InternalRow): DsTuple.TupleBuf = {
    val v = child.eval(input)
    if (v != null) child.dataType match {
      case BinaryType => buf.mergeSketch(
        org.apache.datasketches.tuple.arrayofdoubles.ArrayOfDoublesSketches
          .heapifySketch(org.apache.datasketches.memory.Memory
            .wrap(v.asInstanceOf[Array[Byte]])))
      case dt => throw new IllegalArgumentException(
        s"ds_tuple_merge needs sketch blobs, got ${dt.catalogString}")
    }
    buf
  }

  override def merge(a: DsTuple.TupleBuf, b: DsTuple.TupleBuf): DsTuple.TupleBuf = {
    a.mergeSketch(b.result); a
  }

  override def eval(buf: DsTuple.TupleBuf): Any = buf.result.toByteArray

  override def serialize(buf: DsTuple.TupleBuf): Array[Byte] =
    buf.result.toByteArray
  override def deserialize(b: Array[Byte]): DsTuple.TupleBuf = {
    val buf = createAggregationBuffer()
    buf.mergeSketch(
      org.apache.datasketches.tuple.arrayofdoubles.ArrayOfDoublesSketches
        .heapifySketch(org.apache.datasketches.memory.Memory.wrap(b)))
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): TupleUnionAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TupleUnionAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): TupleUnionAgg =
    copy(child = c)
}
