package graft.sql

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass counting replacements for the replace-arithmetic text
  * statistics the curation queries filter on:
  *
  *  - `word_count(text)` = `length(text) - length(replace(text,' ','')) + 1`
  *  - `marker_count(text, w)` =
  *    `(length(' '||text||' ') - length(replace(' '||text||' ',' w ',''))) div (len(w)+2)`
  *
  * The composable forms stay in the ORACLES (portable SQL); the native
  * forms are value-identical (TextCountsSpec pins it) but do the count
  * in one pass over the UTF-8 bytes instead of materializing two padded
  * copies and three replace()d copies of every document — the dominant
  * per-row cost of the corpus-wide curation filters (guide §1.2 step 2:
  * per-task work). Byte-level is exact: both ' ' and the marker pattern
  * are ASCII, and UTF-8 multi-byte sequences never contain ASCII bytes,
  * so byte matches are exactly character matches; replace() counts
  * non-overlapping left-to-right occurrences, which is what the
  * indexOf-and-skip loop counts.
  */
case class WordCount(child: Expression)
  extends UnaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    GramHashes.requireString("word_count", child)
  override def dataType: DataType = LongType
  override def prettyName: String = "word_count"

  override def nullSafeEval(input: Any): Any = {
    val u = input.asInstanceOf[UTF8String]
    val n = u.numBytes()
    var spaces = 0L
    var i = 0
    while (i < n) {
      if (u.getByte(i) == 0x20) spaces += 1
      i += 1
    }
    spaces + 1
  }

  override protected def withNewChildInternal(c: Expression): WordCount =
    copy(child = c)
}

case class MarkerCount(child: Expression, w: String)
  extends UnaryExpression with CodegenFallback {

  require(w.nonEmpty && !w.contains(' '),
    s"marker_count: marker must be a non-empty single word, got '$w'")

  override def checkInputDataTypes(): TypeCheckResult =
    GramHashes.requireString("marker_count", child)
  override def dataType: DataType = LongType
  override def prettyName: String = "marker_count"

  // ' w ' as UTF-8 bytes — the pattern replace() removed
  @transient private lazy val pat: Array[Byte] =
    s" $w ".getBytes(StandardCharsets.UTF_8)

  override def nullSafeEval(input: Any): Any = {
    val u = input.asInstanceOf[UTF8String]
    val n = u.numBytes()
    // virtual one-space padding on both sides: index -1 and n are ' '
    def at(i: Int): Byte = if (i < 0 || i >= n) 0x20 else u.getByte(i)
    val m = pat.length
    var count = 0L
    var from = -1 // first candidate start in padded coordinates
    while (from + m <= n + 1) {
      var j = 0
      while (j < m && at(from + j) == pat(j)) j += 1
      if (j == m) { count += 1; from += m } // non-overlapping: skip the match
      else from += 1
    }
    count
  }

  override protected def withNewChildInternal(c: Expression): MarkerCount =
    copy(child = c)
}

object TextCounts {
  /** SQL builders: `word_count(text)`, `marker_count(text, 'w')`. */
  val buildWordCount: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 1, "word_count expects exactly one argument")
    WordCount(exprs.head)
  }
  val buildMarkerCount: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 2, "marker_count expects (text, marker)")
    val w = exprs(1) match {
      case Literal(s: UTF8String, StringType) => s.toString
      case other => throw new IllegalArgumentException(
        s"marker_count marker must be a STRING literal, got $other")
    }
    MarkerCount(exprs.head, w)
  }

  /** Idempotent per-session SQL registration. */
  def register(spark: SparkSession): Unit =
    Registration.once(spark, "word_count") {
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "word_count", buildWordCount, "scala_udf")
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "marker_count", buildMarkerCount, "scala_udf")
    }
}
