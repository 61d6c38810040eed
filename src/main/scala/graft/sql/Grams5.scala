package graft.sql

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native expression producing the base-256 code-point 5-gram codes of
  * a string in one pass: `grams5(text) -> array<bigint>`.
  *
  * Semantically identical to the composable form
  * `transform(sequence(...), i -> fold(ascii(substring(text,i+k,1))))`
  * used by the DuckDB oracles (ascii = first code point), but without
  * materializing per-character strings and three intermediate arrays —
  * the hot allocation in the text-dedup pipeline. CodegenFallback is
  * fine: the consumer is explode(), which is outside whole-stage
  * codegen anyway.
  */
case class Grams5(child: Expression) extends UnaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"grams5 requires a STRING argument, got ${child.dataType.sql}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    // code points, matching ascii(single-char substring) semantics
    val n = s.codePointCount(0, s.length)
    val cps = new Array[Int](n)
    var ci = 0
    var k = 0
    while (ci < s.length) {
      val cp = s.codePointAt(ci)
      cps(k) = cp
      k += 1
      ci += Character.charCount(cp)
    }
    if (n < 5) new GenericArrayData(Array.emptyLongArray)
    else {
      val out = new Array[Long](n - 4)
      var i = 0
      while (i < n - 4) {
        out(i) = (((cps(i).toLong * 256 + cps(i + 1)) * 256 + cps(i + 2)) * 256 +
          cps(i + 3)) * 256 + cps(i + 4)
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def withNewChildInternal(c: Expression): Grams5 = copy(child = c)
}

object Grams5 {
  /** SQL builder for `grams5(text)` (register / GraftExtensions). */
  val build: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 1, "grams5 expects exactly one argument")
    Grams5(exprs.head)
  }

  /** Idempotent per-session SQL registration: `grams5(text)`. */
  def register(spark: SparkSession): Unit =
    Registration.once(spark, "grams5") {
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "grams5", build, "scala_udf")
    }
}
