package graft.sql

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._

/** Druid SQL's MV_* multi-value-dimension function family over Spark
  * arrays — the natural mapping, since our connector surfaces Druid
  * multi-value string dimensions as `ArrayType(StringType)` columns
  * (the reference parses `hasMultipleValues` but never implements it:
  * /root/reference/src/segment/column_descriptor.rs:20-21).
  *
  * All pure Catalyst compositions over the built-in collection
  * expressions (codegen'd); the two filter variants compile to
  * higher-order `ArrayFilter` lambdas, preserving element order and
  * duplicates exactly like Druid (an `array_intersect` would dedup).
  *
  * Index contracts: MV_OFFSET is 0-based, MV_ORDINAL 1-based, both
  * null (never error) out of range; MV_SLICE is [start, end) 0-based.
  */
object DruidMv {

  private def filterBy(arr: Expression, allow: Expression,
                       keep: Boolean): Expression = {
    val x = UnresolvedNamedLambdaVariable(Seq("__x"))
    val in = ArrayContains(allow, x)
    ArrayFilter(arr, LambdaFunction(if (keep) in else Not(in), Seq(x)))
  }

  val functions: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("mv_length", "mv_length(arr) - Druid MV_LENGTH",
      { e => require(e.length == 1, "mv_length takes 1 arg")
        Size(e.head, legacySizeOfNull = false) }),
    ("mv_contains", "mv_contains(arr, value) - Druid MV_CONTAINS (scalar value)",
      { e => require(e.length == 2, "mv_contains takes 2 args")
        ArrayContains(e(0), e(1)) }),
    ("mv_overlap", "mv_overlap(arr, arr) - Druid MV_OVERLAP",
      { e => require(e.length == 2, "mv_overlap takes 2 args")
        ArraysOverlap(e(0), e(1)) }),
    ("mv_offset", "mv_offset(arr, i) - 0-based element, null out of range",
      { e => require(e.length == 2, "mv_offset takes 2 args")
        GetArrayItem(e(0), e(1), failOnError = false) }),
    ("mv_ordinal", "mv_ordinal(arr, i) - 1-based element, null out of range",
      { e => require(e.length == 2, "mv_ordinal takes 2 args")
        GetArrayItem(e(0), Subtract(e(1), Literal(1)), failOnError = false) }),
    ("mv_to_string", "mv_to_string(arr, delim) - Druid MV_TO_STRING",
      { e => require(e.length == 2, "mv_to_string takes 2 args")
        ArrayJoin(e(0), e(1), None) }),
    ("string_to_mv", "string_to_mv(str, delimRegex) - Druid STRING_TO_MV",
      { e => require(e.length == 2, "string_to_mv takes 2 args")
        StringSplit(e(0), e(1), Literal(-1)) }),
    ("mv_slice", "mv_slice(arr, start, end) - [start, end) 0-based",
      { e => require(e.length == 3, "mv_slice takes 3 args")
        Slice(e(0), Add(e(1), Literal(1)), Subtract(e(2), e(1))) }),
    ("mv_append", "mv_append(arr, value) - Druid MV_APPEND",
      { e => require(e.length == 2, "mv_append takes 2 args")
        ArrayAppend(e(0), e(1)) }),
    ("mv_prepend", "mv_prepend(value, arr) - Druid MV_PREPEND",
      { e => require(e.length == 2, "mv_prepend takes 2 args")
        ArrayPrepend(e(1), e(0)) }),
    ("mv_concat", "mv_concat(arr, arr) - Druid MV_CONCAT",
      { e => require(e.length == 2, "mv_concat takes 2 args")
        Concat(Seq(e(0), e(1))) }),
    ("mv_filter_only",
      "mv_filter_only(arr, allowedArr) - keep listed values, order/dups preserved",
      { e => require(e.length == 2, "mv_filter_only takes 2 args")
        filterBy(e(0), e(1), keep = true) }),
    ("mv_filter_none",
      "mv_filter_none(arr, deniedArr) - drop listed values, order/dups preserved",
      { e => require(e.length == 2, "mv_filter_none takes 2 args")
        filterBy(e(0), e(1), keep = false) }),
    // Druid distinguishes MV-STRING dims from ARRAY-typed columns and
    // converts with these two; our connector surfaces MV dims as
    // ArrayType(StringType) already, so both are the identity on
    // arrays — registered so dashboard SQL (`UNNEST(MV_TO_ARRAY(x))`)
    // parses unchanged
    ("mv_to_array", "mv_to_array(arr) - Druid MV_TO_ARRAY (identity here)",
      { e => require(e.length == 1, "mv_to_array takes 1 arg"); e.head }),
    ("array_to_mv", "array_to_mv(arr) - Druid ARRAY_TO_MV (identity here)",
      { e => require(e.length == 1, "array_to_mv takes 1 arg"); e.head }))
}
