package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Differential harness: one deterministic pseudo-random table (nulls
  * included) written to BOTH a druid segment table and parquet, then a
  * battery of predicates evaluated on each and compared exactly. Every
  * pushdown path (time intervals, dim equality/IN, prefix, contains,
  * ends-with, numeric zones, null trailers, combinations) is thereby
  * checked against Spark's own parquet semantics — if storage pruning
  * ever drops or duplicates a row, the two sides diverge.
  */
class DifferentialScanSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestSession.spark

  private val N = 20000

  // xorshift-ish deterministic generator (no java Random — stable
  // across JVMs and reruns)
  private def h(i: Long, salt: Long): Long = {
    var x = i * 0x9E3779B97F4A7C15L + salt
    x ^= x >>> 27; x *= 0x3C79AC492BA7B653L; x ^= x >>> 33
    x
  }

  private lazy val (druidDir, parquetDir): (String, String) = {
    import spark.implicits._
    val rows = (0 until N).map { i =>
      val who =
        if (h(i, 1) % 19 == 0) null
        else s"u${(h(i, 2) % 40 + 40) % 40}%03d".format((h(i, 2) % 40 + 40) % 40)
      val v: java.lang.Long =
        if (h(i, 3) % 13 == 0) null else java.lang.Long.valueOf(h(i, 4) % 1000)
      val x: java.lang.Double =
        if (h(i, 5) % 11 == 0) null
        else java.lang.Double.valueOf((h(i, 6) % 10000) / 10.0)
      (1700000000000L + (h(i, 7) % 86400000L + 86400000L) % 86400000L,
        who, v, x)
    }
    val df = rows.toDF("__time", "who", "v", "x")
    val d = Files.createTempDirectory("graft-diff").toString + "/t"
    val p = Files.createTempDirectory("graft-diff-pq").toString + "/t"
    df.repartition(4).write.format("druid")
      .option("segmentGranularity", "hour").mode("overwrite").save(d)
    df.write.mode("overwrite").parquet(p)
    (d, p)
  }

  private def compare(name: String, pred: DataFrame => DataFrame): Unit = {
    val dru = pred(spark.read.format("druid").load(druidDir))
      .selectExpr("__time", "who", "v", "x")
    val par = pred(spark.read.parquet(parquetDir)
        .withColumn("__time", timestamp_millis(col("__time"))))
      .selectExpr("__time", "who", "v", "x")
    val missing = par.exceptAll(dru).count()
    val extra = dru.exceptAll(par).count()
    assert(missing == 0 && extra == 0,
      s"$name diverges: missing=$missing extra=$extra")
  }

  private val t0 = 1700000000000L

  private val cases: Seq[(String, DataFrame => DataFrame)] = Seq(
    "time range" -> (df => df.filter(col("__time") >= timestamp_millis(lit(t0 + 3600000L)) &&
      col("__time") < timestamp_millis(lit(t0 + 7200000L)))),
    "time point" -> (df => df.filter(col("__time") === timestamp_millis(lit(t0 + 5000000L)))),
    "dim equality" -> (df => df.filter(col("who") === "u007")),
    "dim IN" -> (df => df.filter(col("who").isin("u001", "u017", "u039"))),
    "prefix" -> (df => df.filter(col("who").startsWith("u0"))),
    "prefix deep" -> (df => df.filter(col("who").startsWith("u03"))),
    "contains" -> (df => df.filter(col("who").contains("1"))),
    "ends with" -> (df => df.filter(col("who").endsWith("7"))),
    "numeric range" -> (df => df.filter(col("v") >= 100 && col("v") < 300)),
    "double range" -> (df => df.filter(col("x") > 500.5)),
    "is null" -> (df => df.filter(col("v").isNull)),
    "is not null" -> (df => df.filter(col("x").isNotNull)),
    "string null" -> (df => df.filter(col("who").isNull)),
    "conjunction" -> (df => df.filter(col("who").startsWith("u0") &&
      col("v") >= 500 && col("x").isNotNull)),
    "kitchen sink" -> (df => df.filter(col("who").contains("2") &&
      col("who").endsWith("5") && col("v").isNotNull &&
      col("__time") >= timestamp_millis(lit(t0 + 1000000L)))),
    "numeric IN" -> (df => df.filter(col("v").isin(7L, 444L, 999L))),
    "time IN" -> (df => df.filter(col("__time").isin(
      java.sql.Timestamp.from(java.time.Instant.ofEpochMilli(t0 + 5000000L)),
      java.sql.Timestamp.from(java.time.Instant.ofEpochMilli(t0 + 9000000L))))),
    "null-safe string eq" -> (df => df.filter(col("who") <=> "u015")),
    "null-safe numeric eq" -> (df => df.filter(col("v") <=> 444L)),
    "null-safe eq null" -> (df => df.filter(col("v") <=> lit(null).cast("long"))),
    "disjunction" -> (df => df.filter(col("who") === "u001" ||
      col("v") < 50)),
    "disjunction mixed" -> (df => df.filter(
      (col("who").startsWith("u03") && col("v") > 500) ||
        col("x").isNull || col("v") === 7L)),
    "disjunction with time" -> (df => df.filter(
      col("__time") < timestamp_millis(lit(t0 + 1800000L)) ||
        col("who") === "u039")),
    "negation (residual only)" -> (df => df.filter(!(col("who") === "u001")))
  )

  for ((name, pred) <- cases)
    test(s"druid == parquet under: $name") { compare(name, pred) }

  test("druid == parquet under 30 generated disjunction mixes") {
    // (a OR b) AND c — drives the could-match evaluator across every
    // leaf family crossed with every conjunctive bound
    val atoms: Vector[Column] = Vector(
      col("__time") >= timestamp_millis(lit(t0 + 10000000L)),
      col("who").startsWith("u0"), col("who").contains("3"),
      col("who") === "u015", col("who").isin("u002", "u023"),
      col("v") >= 250, col("v") < 750, col("v").isNull,
      col("x") > 250.25, col("x").isNull, col("v") === 444L)
    def pick(seed: Long): Column =
      atoms(((h(seed, 17) % atoms.length).toInt + atoms.length) % atoms.length)
    for (i <- 0 until 30) {
      val pred = (pick(i * 3) || pick(i * 3 + 1)) && pick(i * 3 + 2)
      compare(s"disjunction mix #$i", df => df.filter(pred))
    }
  }

  test("druid == parquet under 30 generated conjunctions") {
    // deterministic pseudo-random 2-3 atom conjunctions over every
    // pushdown family — the interaction coverage the hand-picked
    // shapes above can't enumerate
    val atoms: Vector[Column] = Vector(
      col("__time") >= timestamp_millis(lit(t0 + 10000000L)),
      col("__time") < timestamp_millis(lit(t0 + 70000000L)),
      col("who").startsWith("u0"),
      col("who").startsWith("u2"),
      col("who").contains("3"),
      col("who").endsWith("9"),
      col("who") === "u015",
      col("who").isin("u002", "u023"),
      col("who").isNotNull,
      col("v") >= 250, col("v") < 750, col("v").isin(3L, 500L, 997L),
      col("v").isNull, col("v").isNotNull,
      col("x") > 250.25, col("x") <= 600.0, col("x").isNull)
    for (i <- 0 until 30) {
      val n = 2 + (h(i, 11) % 2).toInt.abs
      val picked = (0 until n)
        .map(j => atoms(((h(i * 7 + j, 13) % atoms.length).toInt + atoms.length) % atoms.length))
      val pred = picked.reduce(_ && _)
      compare(s"conjunction #$i", df => df.filter(pred))
    }
  }
}
