package graft.sql

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native expression producing the DISTINCT space-joined word n-grams
  * of a string in one pass: `word_ngrams(text, n) -> array<string>`.
  *
  * Semantically identical to
  * `array_distinct(transform(sequence(1, size(ws)-n+1),
  *    i -> concat_ws(' ', slice(ws, i, n))))` over
  * `ws = split(text, ' ', -1)` — and to DuckDB's
  * `ws[i] || ' ' || ws[i+1] || ...` over `string_split(text, ' ')` —
  * but without the interpreted higher-order lambdas, the per-element
  * array slices, and the O(n^2) interpreted array_distinct that make
  * the composable form the hot allocation in decontamination-style
  * pipelines (measured ~4x the whole-query time at sf0.1).
  * CodegenFallback is fine: the consumer is explode(), which sits
  * outside whole-stage codegen anyway.
  */
case class WordNgrams(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  require(n >= 1, s"word_ngrams: n must be >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"word_ngrams requires a STRING argument, got ${child.dataType.sql}")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    // split(" ", -1): KEEP trailing empty tokens, matching Spark's
    // split(text, ' ') and DuckDB's string_split — Java's default
    // limit-0 split would silently drop them
    val words = input.asInstanceOf[UTF8String].toString.split(" ", -1)
    if (words.length < n) new GenericArrayData(Array.empty[Any])
    else {
      val seen = new java.util.LinkedHashSet[String]()
      val sb = new java.lang.StringBuilder()
      var i = 0
      while (i <= words.length - n) {
        sb.setLength(0)
        var k = 0
        while (k < n) {
          if (k > 0) sb.append(' ')
          sb.append(words(i + k))
          k += 1
        }
        seen.add(sb.toString)
        i += 1
      }
      val out = new Array[Any](seen.size())
      val it = seen.iterator()
      var j = 0
      while (it.hasNext) { out(j) = UTF8String.fromString(it.next()); j += 1 }
      new GenericArrayData(out)
    }
  }

  override protected def withNewChildInternal(c: Expression): WordNgrams =
    copy(child = c)
}

object WordNgrams {
  /** SQL builder for `word_ngrams(text, n)` (register / GraftExtensions). */
  val build: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 2, "word_ngrams expects (text, n)")
    val n = exprs(1) match {
      case Literal(v: Int, IntegerType) => v
      case other => throw new IllegalArgumentException(
        s"word_ngrams: n must be an integer literal, got $other")
    }
    WordNgrams(exprs.head, n)
  }

  /** Idempotent per-session SQL registration: `word_ngrams(text, n)`. */
  def register(spark: SparkSession): Unit =
    Registration.once(spark, "word_ngrams") {
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "word_ngrams", build, "scala_udf")
    }
}
