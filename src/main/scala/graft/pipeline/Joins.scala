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
}
