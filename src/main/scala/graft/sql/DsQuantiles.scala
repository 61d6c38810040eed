package graft.sql

import org.apache.spark.sql.{Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.quantiles.{DoublesSketch, DoublesUnion}
import org.apache.datasketches.quantilescommon.QuantileSearchCriteria

/** Apache DataSketches quantiles (DoublesSketch) over the wire format
  * of Druid's `quantilesDoublesSketch` aggregator (datasketches-java
  * ships with Spark) — the third real-interop sketch family next to
  * HLL (graft.sql.DsTheta's scaladoc) and Theta: a Druid deployment's
  * latency/size rollup segments carry exactly these blobs.
  *
  * Determinism for the oracle gate: while total retained n stays within
  * the sketch's exact regime (base buffer, n <= 2k), every quantile is
  * an EXACT order statistic — `getQuantile(q, INCLUSIVE)` returns the
  * item at 1-based rank `max(1, ceil(q*n))` of the sorted values —
  * independent of build/merge order, so DuckDB replays it with a
  * window rank. (Serialized blob BYTES do depend on insertion order in
  * exact mode — the base buffer is unsorted — which is why the gate
  * compares quantile values, never blob bytes.) Beyond 2k the sketch
  * degrades gracefully to Druid-compatible approximation.
  */
object DsQuantiles {
  def fromValues(vs: Seq[Double], k: Int): Array[Byte] = {
    val sk = DoublesSketch.builder().setK(k).build()
    vs.foreach(sk.update)
    sk.toByteArray(true)
  }

  def unionAll(bs: Seq[Array[Byte]], maxK: Int): Array[Byte] = {
    val u = DoublesUnion.builder().setMaxK(maxK).build()
    bs.foreach(b => u.union(DoublesSketch.wrap(Memory.wrap(b))))
    u.getResult.toByteArray(true)
  }

  def n(b: Array[Byte]): Long =
    DoublesSketch.wrap(Memory.wrap(b)).getN

  def quantile(b: Array[Byte], q: Double): Double =
    DoublesSketch.wrap(Memory.wrap(b)).getQuantile(q,
      QuantileSearchCriteria.INCLUSIVE)
}

/** Merge pre-built DoublesSketch blobs (a segment's COMPLEX column) —
  * Druid's quantilesDoublesSketch merge aggregator on Spark. Same
  * batched-fold shape as [[DsThetaUnionAgg]]: blobs buffer and fold
  * through one live DoublesUnion per 256 (and once at finish), so
  * per-group cost is O(rows), not O(rows x retained).
  */
class DsQuantilesUnionAgg(maxK: Int) extends Aggregator[Array[Byte],
    scala.collection.mutable.ArrayBuffer[Array[Byte]], Array[Byte]] {
  private type Buf = scala.collection.mutable.ArrayBuffer[Array[Byte]]
  private val foldAt = 256
  private def foldInPlace(b: Buf): Buf = {
    val folded = DsQuantiles.unionAll(b.toSeq, maxK)
    b.clear()
    b += folded
  }
  def zero: Buf = scala.collection.mutable.ArrayBuffer.empty
  def reduce(b: Buf, v: Array[Byte]): Buf =
    if (v == null) b
    else { b += v; if (b.length >= foldAt) foldInPlace(b) else b }
  def merge(a: Buf, b: Buf): Buf = {
    a ++= b
    if (a.length >= foldAt) foldInPlace(a) else a
  }
  def finish(r: Buf): Array[Byte] = DsQuantiles.unionAll(r.toSeq, maxK)
  def bufferEncoder: Encoder[scala.collection.mutable.ArrayBuffer[Array[Byte]]] =
    Encoders.kryo[scala.collection.mutable.ArrayBuffer[Array[Byte]]]
  def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}

object DsQuantilesFunctions {
  /** Register ds_quantiles_from_vals / ds_quantiles_union_agg /
    * ds_quantiles_n / ds_quantiles_quantile. `k` is fixed at
    * registration (Druid's aggregator takes it the same way).
    */
  def register(spark: SparkSession, k: Int = 2048): Unit = {
    spark.udf.register("ds_quantiles_from_vals",
      functions.udf((vs: Seq[Double]) => DsQuantiles.fromValues(vs, k)))
    spark.udf.register("ds_quantiles_union_agg",
      functions.udaf(new DsQuantilesUnionAgg(k)))
    spark.udf.register("ds_quantiles_n",
      functions.udf((b: Array[Byte]) => if (b == null) 0L else DsQuantiles.n(b)))
    spark.udf.register("ds_quantiles_quantile",
      functions.udf((b: Array[Byte], q: Double) => DsQuantiles.quantile(b, q)))
  }
}
