package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series join operators Spark lacks natively.
  *
  * As-of join follows the preference order from the design notes:
  * COMPOSE built-ins before reaching for a custom SparkPlan. The
  * union+window formulation plans as one shuffle on (keys) + one sort —
  * the same cost a dedicated sort-merge as-of operator would pay — and
  * stays inside Catalyst/WSCG, scales with the shuffle, and AQE handles
  * skewed keys. A custom physical operator would only remove the
  * union's row tagging overhead.
  */
object Joins {

  /** For every left row, attach the payload of the LATEST right row with
    * `right.tsCol <= left.tsCol` and equal join keys (backward as-of
    * join). Right must be unique per (keys, ts) — pre-aggregate if not.
    *
    * @param payload right-side columns to carry (renamed as given)
    */
  def asOfBackward(left: DataFrame, right: DataFrame, tsCol: String,
                   keys: Seq[String], payload: Seq[String]): DataFrame = {
    val leftCols = left.columns
    val otherLeft = leftCols.filterNot(c => keys.contains(c) || c == tsCol)
    // The payload travels as ONE struct, null only on left-tagged rows:
    // last(ignoreNulls) then latches onto the latest right ROW, so a
    // matched right row whose payload values are genuinely NULL
    // propagates those nulls instead of resurrecting an older row's
    // non-null values (standard as-of semantics).
    val payloadType = org.apache.spark.sql.types.StructType(
      payload.map(p => right.schema(p)))
    // tag: right rows sort BEFORE left rows at equal ts so "<=" matches
    val taggedRight = right.select(
      (keys.map(col) :+ col(tsCol) :+ lit(0).as("__side")
        :+ struct(payload.map(col): _*).as("__payload")) ++
        otherLeft.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val taggedLeft = left.select(
      (keys.map(col) :+ col(tsCol) :+ lit(1).as("__side")
        :+ lit(null).cast(payloadType).as("__payload")) ++
        otherLeft.map(col): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    taggedRight.unionByName(taggedLeft)
      .withColumn("__payload", last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select((keys.map(col) :+ col(tsCol)) ++
        payload.map(p => col(s"__payload.$p").as(p)) ++ otherLeft.map(col): _*)
  }

  /** Banded range join: every left row matched to the right rows with
    * `right.rightTs` in `[left.leftTs - windowMicros, left.leftTs)` and
    * equal join keys.
    *
    * The inequality predicate is re-expressed as an EQUI-join on
    * (keys, time bucket) of width `windowMicros`: right rows land in
    * their own bucket, each left row probes the two buckets covering
    * its window, and the exact bounds run as a post-join filter. At
    * scale this is one shuffle on small keys instead of the
    * per-key-quadratic sort/cross plan Spark gives raw inequality
    * joins; bucket width = window width caps the probe fan-out at 2.
    *
    * Column names (other than `keys`) must be disjoint between the two
    * sides; `leftTs`/`rightTs` are post-1970 timestamp columns (bucket
    * arithmetic uses integral division on epoch micros).
    */
  def rangeJoinPreceding(left: DataFrame, right: DataFrame,
                         leftTs: String, rightTs: String,
                         keys: Seq[String], windowMicros: Long): DataFrame = {
    require(windowMicros > 0, s"windowMicros must be positive: $windowMicros")
    val l = left
      .withColumn("__lus", unix_micros(col(leftTs)))
      .withColumn("__bkt", explode(sequence(
        expr(s"(__lus - $windowMicros) div $windowMicros"),
        expr(s"__lus div $windowMicros"))))
    val r = right
      .withColumn("__rus", unix_micros(col(rightTs)))
      .withColumn("__bkt", expr(s"__rus div $windowMicros"))
    l.join(r, keys :+ "__bkt")
      .filter(col("__rus") >= col("__lus") - windowMicros &&
        col("__rus") < col("__lus"))
      .drop("__lus", "__rus", "__bkt")
  }

  /** Interval-overlap join — the third member of the temporal-join
    * family (as-of, banded-range, overlap): every (left, right) pair
    * equal on `keys` whose half-open timestamp intervals
    * [start, end) overlap, annotated with `overlap_us`. Each interval
    * explodes over the coarse buckets it spans, pairs meet in an
    * equi-join on (keys, bucket), the exact overlap predicate
    * filters — and multi-bucket duplicate pairs are eliminated WITHOUT
    * a distinct: a pair is emitted only in the bucket of
    * greatest(lStart, rStart), a point both intervals contain, so
    * exactly one bucket claims each pair. At 100 TB: one shuffle on
    * (key, bucket), fan-out bounded by intervalLength/bucket, and no
    * post-join dedup exchange at all. Zero-length intervals pair with
    * nothing (half-open semantics).
    */
  def intervalOverlapJoin(left: DataFrame, right: DataFrame,
                          lStart: String, lEnd: String,
                          rStart: String, rEnd: String,
                          keys: Seq[String],
                          bucketMicros: Long): DataFrame = {
    require(bucketMicros > 0, s"bucketMicros must be positive: $bucketMicros")
    val l = left
      .withColumn("__ls", unix_micros(col(lStart)))
      .withColumn("__le", unix_micros(col(lEnd)))
      .filter(col("__le") > col("__ls"))
      .withColumn("__bkt", explode(sequence(
        expr(s"__ls div $bucketMicros"),
        expr(s"(__le - 1) div $bucketMicros"))))
    val r = right
      .withColumn("__rs", unix_micros(col(rStart)))
      .withColumn("__re", unix_micros(col(rEnd)))
      .filter(col("__re") > col("__rs"))
      .withColumn("__bkt", explode(sequence(
        expr(s"__rs div $bucketMicros"),
        expr(s"(__re - 1) div $bucketMicros"))))
    l.join(r, keys :+ "__bkt")
      .filter(col("__ls") < col("__re") && col("__rs") < col("__le"))
      .filter(col("__bkt") ===
        expr(s"greatest(__ls, __rs) div $bucketMicros"))
      .withColumn("overlap_us",
        least(col("__le"), col("__re")) - greatest(col("__ls"), col("__rs")))
      .drop("__bkt", "__ls", "__le", "__rs", "__re")
  }
}
