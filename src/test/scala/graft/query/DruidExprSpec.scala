package graft.query

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** The Druid expression-language translator: wire-dialect inputs must
  * evaluate to Druid's documented results when run through Spark.
  */
class DruidExprSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestSession.spark

  /** Evaluate a Druid expression over one row with the given columns. */
  private def eval(druid: String, cols: (String, Any)*): Any = {
    graft.sql.DruidSqlCompat.register(spark)
    import spark.implicits._
    val df = Seq(1).toDF("__one")
    val withCols = cols.foldLeft(df) { case (d, (n, v)) =>
      d.withColumn(n, lit(v))
    }
    withCols.select(expr(DruidExpr.toSparkSql(druid)).as("r"))
      .collect().head.get(0)
  }

  test("operators: == != && || ! ^ and precedence") {
    assert(eval("1 + 2 * 3") == 7)
    assert(eval("x == 4 && y != 2", "x" -> 4, "y" -> 3) == true)
    assert(eval("x == 1 || !(y == 2)", "x" -> 0, "y" -> 2) == false)
    assert(eval("2 ^ 10") == 1024.0)
    assert(eval("2 ^ 3 + 1") == 9.0) // power binds tighter than +
    assert(eval("-x + 1", "x" -> 5) == -4)
  }

  test("unary minus binds tighter than '^' (Druid grammar), '^' stays right-assoc") {
    // Druid parses -x^2 as power(-x, 2), NOT -(power(x, 2))
    assert(eval("-x ^ 2", "x" -> 5) == 25.0)
    assert(eval("-x ^ 3", "x" -> 2) == -8.0)
    assert(eval("2 ^ -3") == 0.125)
    assert(eval("2 ^ 3 ^ 2") == 512.0) // right-associative: 2^(3^2)
  }

  test("identifiers: double-quoted and backtick forms both map to backticks") {
    assert(DruidExpr.toSparkSql("\"j.k\" == 'a'") == "(`j.k` = 'a')")
    assert(DruidExpr.toSparkSql("`j.k` == 'a'") == "(`j.k` = 'a')")
    assert(DruidExpr.toSparkSql("user_id % 10") == "(`user_id` % 10)")
  }

  test("0-based string offsets: substring and strpos") {
    assert(eval("substring(s, 0, 3)", "s" -> "abcdef") == "abc")
    assert(eval("substring(s, 2, 2)", "s" -> "abcdef") == "cd")
    assert(eval("substring(s, 2)", "s" -> "abcdef") == "cdef")
    assert(eval("strpos(s, 'cd')", "s" -> "abcdef") == 2)
    assert(eval("strpos(s, 'zz')", "s" -> "abcdef") == -1)
  }

  test("function renames: strlen, log, pow, binary min/max, bitwise") {
    assert(eval("strlen(s)", "s" -> "abc") == 3)
    assert(eval("pow(2, 8)") == 256.0)
    assert(eval("min(x, y)", "x" -> 3, "y" -> 7) == 3)
    assert(eval("max(x, y)", "x" -> 3, "y" -> 7) == 7)
    assert(eval("bitwiseAnd(12, 10)") == 8)
    assert(eval("bitwiseOr(12, 10)") == 14)
    assert(eval("bitwiseXor(12, 10)") == 6)
  }

  test("div is integer division; contains_string maps to contains") {
    assert(eval("div(x, y)", "x" -> 7L, "y" -> 2L) == 3L)
    assert(eval("div(x, y)", "x" -> -7L, "y" -> 2L) == -3L) // truncating, like Druid (Java semantics)
    assert(eval("contains_string(s, 'cd')", "s" -> "abcdef") == true)
    assert(eval("icontains_string(s, 'CD')", "s" -> "abcdef") == true)
  }

  test("case_searched and case_simple compile to CASE") {
    assert(eval("case_searched(x > 2, 'big', x > 0, 'small', 'neg')",
      "x" -> 1) == "small")
    assert(eval("case_searched(x > 2, 'big', x > 0, 'small', 'neg')",
      "x" -> -1) == "neg")
    assert(eval("case_simple(s, 'a', 1, 'b', 2, 0)", "s" -> "b") == 2)
    assert(eval("case_simple(s, 'a', 1, 'b', 2, 0)", "s" -> "z") == 0)
  }

  test("cast with Druid type names; like; if; nvl") {
    assert(eval("cast(s, 'LONG')", "s" -> "42") == 42L)
    assert(eval("cast(x, 'STRING')", "x" -> 42) == "42")
    assert(eval("like(s, 'ab%')", "s" -> "abcdef") == true)
    assert(eval("if(x > 0, 'pos', 'neg')", "x" -> 3) == "pos")
    assert(eval("nvl(z, 'dflt')",
      "z" -> null.asInstanceOf[String]) == "dflt")
  }

  test("timestamp_floor/shift/extract map onto the compat time functions") {
    val ts = java.sql.Timestamp.valueOf("2024-03-15 13:45:30")
    assert(eval("timestamp_floor(t, 'P1D')", "t" -> ts) ==
      java.sql.Timestamp.valueOf("2024-03-15 00:00:00"))
    assert(eval("timestamp_extract(t, 'HOUR')", "t" -> ts) == 13L)
    assert(eval("timestamp_shift(t, 'P1D', 2)", "t" -> ts) ==
      java.sql.Timestamp.valueOf("2024-03-17 13:45:30"))
  }

  test("regexp_replace, log2, degrees conversions, parse_long") {
    assert(eval("regexp_replace(s, '[0-9]+', '#')", "s" -> "a12b3") == "a#b#")
    assert(eval("log2(x)", "x" -> 8.0) == 3.0)
    assert(eval("todegrees(x)", "x" -> math.Pi) == 180.0)
    assert(eval("toradians(x)", "x" -> 180.0) == math.Pi)
    assert(eval("parse_long(s)", "s" -> "42") == 42L)
    assert(eval("parse_long(s, 16)", "s" -> "ff") == 255L)
    // non-parseable → null like Druid (TRY_CAST; ANSI would error)
    assert(eval("parse_long(s)", "s" -> "click") == null)
    // the rest of Druid's math surface that maps 1:1
    assert(eval("sinh(x)", "x" -> 0.0) == 0.0)
    assert(eval("tanh(x)", "x" -> 0.0) == 0.0)
    assert(eval("expm1(x)", "x" -> 0.0) == 0.0)
    assert(eval("log1p(x)", "x" -> 0.0) == 0.0)
    assert(eval("rint(x)", "x" -> 2.5) == 2.0) // banker's rounding
    assert(eval("pi()") == math.Pi)
    assert(eval("hypot(x, y)", "x" -> 3.0, "y" -> 4.0) == 5.0)
  }

  test("ipv4 family passes through to the registered SQL functions") {
    assert(eval("ipv4_parse('10.0.0.1')") == 167772161L)
    assert(eval("ipv4_stringify(167772161)") == "10.0.0.1")
    assert(eval("ipv4_match(ip, '10.0.0.0/8')", "ip" -> "10.9.9.9") == true)
    assert(eval("ipv4_match(ip, '10.0.0.0/8')", "ip" -> "11.0.0.1") == false)
  }

  test("parser terminates cleanly on arbitrary input (fuzz)") {
    // any input must either translate or throw the documented
    // IllegalArgumentException — never hang, never leak an index error
    val junk = Gen.choose(0, 24).flatMap(n =>
      Gen.listOfN(n, Gen.asciiPrintableChar).map(_.mkString))
    val nearlyValid = Gen.oneOf(
      "substring(s, 0, ", "x ^ ^ 2", "1 + (2 * ", "''", "\"", "`a",
      "case_searched(x", "-", "!", "a.b == 'c", "1e+", "..", "x %% y",
      "min(", "cast(x, 'WAT')", "timestamp_floor(t,)", "))((")
    val prop = Prop.forAllNoShrink(Gen.frequency(
      3 -> junk, 1 -> nearlyValid)) { s =>
      try { DruidExpr.toSparkSql(s); true }
      catch { case _: IllegalArgumentException => true }
      // anything else (StackOverflow, index error) fails the property
    }
    val r = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(1000), prop)
    assert(r.passed, r.status.toString)
  }

  test("unsupported functions fail loudly; SQL text falls back upstream") {
    val e = intercept[IllegalArgumentException] {
      DruidExpr.toSparkSql("some_unknown_fn(x)")
    }
    assert(e.getMessage.contains("some_unknown_fn"))
    // SQL keywords are not Druid-expr — parse must reject (NativeQuery
    // then falls back to Spark SQL)
    intercept[IllegalArgumentException] {
      DruidExpr.toSparkSql("value > 50 AND user_id = 4")
    }
  }
}
