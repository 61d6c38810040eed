package graft.sql

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-row 5-gram bucket histogram:
  * `grams5_hist(text, mod) -> array<bigint>` of length `mod`, where
  * element b counts the grams of [[Grams5]] with `code % mod == b`.
  *
  * Value-identical to
  * `explode(grams5(text))` → `tg % mod` → `count per (row, bucket)`
  * but as a single per-row projection: the corpus-length gram stream
  * never becomes rows at all, so a bucket-statistics pass (d26's DSIR
  * importance weights) reduces from a gram-scale Generate + hash
  * aggregate to a scan + O(text) arithmetic + mod-sized emit per doc.
  * Strings shorter than 5 code points yield all-zero counts, matching
  * the empty gram array.
  */
case class Grams5Hist(child: Expression, mod: Int)
  extends UnaryExpression with CodegenFallback {

  require(mod > 0, s"grams5_hist: mod must be positive, got $mod")

  override def checkInputDataTypes(): TypeCheckResult =
    GramHashes.requireString("grams5_hist", child)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "grams5_hist"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val n = s.codePointCount(0, s.length)
    val counts = new Array[Long](mod)
    if (n >= 5) {
      val cps = new Array[Int](n)
      var ci = 0
      var k = 0
      while (ci < s.length) {
        val cp = s.codePointAt(ci)
        cps(k) = cp
        k += 1
        ci += Character.charCount(cp)
      }
      var i = 0
      while (i < n - 4) {
        val g = (((cps(i).toLong * 256 + cps(i + 1)) * 256 + cps(i + 2)) * 256 +
          cps(i + 3)) * 256 + cps(i + 4)
        // gram codes are non-negative, so % is a true modulus
        counts((g % mod).toInt) += 1
        i += 1
      }
    }
    new GenericArrayData(counts)
  }

  override protected def withNewChildInternal(c: Expression): Grams5Hist =
    copy(child = c)
}

object Grams5Hist {
  /** SQL builder for `grams5_hist(text, mod)`. */
  val build: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 2, "grams5_hist expects (text, mod)")
    Grams5Hist(exprs.head, GramHashes.litInt(exprs(1), "grams5_hist mod"))
  }

  /** Idempotent per-session SQL registration: `grams5_hist(text, mod)`. */
  def register(spark: SparkSession): Unit =
    Registration.once(spark, "grams5_hist") {
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "grams5_hist", build, "scala_udf")
    }
}
