package graft.cli

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** The ingestion-statement parser sits on the wire: arbitrary client
  * SQL must either parse into exactly the submitted clauses, reject
  * loudly, or fall through to the query path — never mis-split a
  * clause or let a dataSource name reach the filesystem unvalidated.
  */
class IngestParseSpec extends AnyFunSuite {

  private def check(prop: Prop): Unit = {
    val r = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(100), prop)
    assert(r.passed, r.status.toString)
  }

  private val tableGen =
    Gen.identifier.map(_.take(20)).suchThat(_.nonEmpty)
  private val granGen = Gen.oneOf(
    "DAY" -> Some("day"), "HOUR" -> Some("hour"), "MONTH" -> Some("month"),
    "YEAR" -> Some("year"), "ALL" -> None, "ALL TIME" -> None,
    "day" -> Some("day"), "FLOOR(__time TO DAY)" -> Some("day"),
    "floor(__time to month)" -> Some("month"),
    "TIME_FLOOR(__time, 'PT1H')" -> Some("hour"),
    "TIME_FLOOR(__time, 'P1Y')" -> Some("year"))
  private val selGen = Gen.oneOf(
    "SELECT * FROM src",
    "SELECT __time, a, b FROM src WHERE a > 1",
    "WITH x AS (SELECT * FROM src) SELECT * FROM x",
    "SELECT __time, count(*) AS c FROM src GROUP BY __time")

  test("round-trip: generated INSERT statements parse into their clauses") {
    check(Prop.forAllNoShrink(tableGen, selGen, granGen) { (t, sel, gran) =>
      val spec = DruidServe.parseIngest(
        s"INSERT INTO $t $sel PARTITIONED BY ${gran._1}").get
      spec.table == t && spec.selectSql == sel &&
        spec.granularity == gran._2 && !spec.replaceAll &&
        spec.replaceWhere.isEmpty && spec.clusterBy.isEmpty
    })
  }

  test("round-trip: REPLACE with OVERWRITE and CLUSTERED BY") {
    check(Prop.forAllNoShrink(tableGen, selGen, granGen) { (t, sel, gran) =>
      val all = DruidServe.parseIngest(
        s"REPLACE INTO $t OVERWRITE ALL $sel PARTITIONED BY ${gran._1} " +
          "CLUSTERED BY a, `b`").get
      val cond = "__time >= TIMESTAMP '2024-01-01 00:00:00' AND " +
        "__time < TIMESTAMP '2024-01-02 00:00:00'"
      val where = DruidServe.parseIngest(
        s"REPLACE INTO $t OVERWRITE WHERE $cond $sel PARTITIONED BY ${gran._1}").get
      all.table == t && all.replaceAll && all.replaceWhere.isEmpty &&
        all.selectSql == sel && all.clusterBy == Seq("a", "b") &&
        !where.replaceAll && where.replaceWhere.contains(cond) &&
        where.selectSql == sel
    })
  }

  test("plain queries fall through, never error") {
    check(Prop.forAllNoShrink(Gen.asciiPrintableStr) { s0 =>
      val up = s0.stripLeading().toUpperCase(java.util.Locale.ROOT)
      up.startsWith("INSERT") || up.startsWith("REPLACE") ||
        DruidServe.parseIngest(s0).isEmpty
    })
  }

  test("malformed ingestion rejects loudly; names cannot traverse paths") {
    // INSERT-shaped garbage is a loud error, never a silent fall-through
    Seq("INSERT INTO t SELECT * FROM src",                    // no PARTITIONED BY
        "INSERT INTO t PARTITIONED BY DAY",                   // no SELECT
        "REPLACE INTO t SELECT * FROM s PARTITIONED BY DAY",  // no OVERWRITE
        "INSERT INTO t SELECT * FROM s PARTITIONED BY FORTNIGHT",
        "INSERT gibberish").foreach { sql =>
      intercept[IllegalArgumentException](DruidServe.parseIngest(sql))
    }
    // path-traversing dataSource names can never escape validation
    Seq("../evil", "a/b", "a..b/c", "..", ".hidden").foreach { t =>
      intercept[IllegalArgumentException](DruidServe.parseIngest(
        s"INSERT INTO $t SELECT * FROM s PARTITIONED BY DAY"))
    }
  }

  test("clause mis-splits (subquery in WHERE, keyword in a literal) reject loudly") {
    // a subquery inside OVERWRITE WHERE is rejected explicitly — the
    // interval-overwrite expression parser can't evaluate it, and some
    // shapes (a UNION inside) even mis-split the clause regex
    val e1 = intercept[IllegalArgumentException](DruidServe.parseIngest(
      "REPLACE INTO t OVERWRITE WHERE __time IN (SELECT ts FROM other) " +
        "SELECT * FROM src PARTITIONED BY DAY"))
    assert(e1.getMessage.contains("subquer"))
    // ... including the mis-splitting shape (bare SELECT inside after a
    // UNION: the lazy cond ends unbalanced)
    val e1b = intercept[IllegalArgumentException](DruidServe.parseIngest(
      "REPLACE INTO t OVERWRITE WHERE x = (SELECT a FROM o UNION " +
        "SELECT b FROM p) SELECT * FROM src PARTITIONED BY DAY"))
    assert(e1b.getMessage.contains("unbalanced") ||
      e1b.getMessage.contains("subquer"))
    // a string literal containing the word 'select' in the cond is fine
    val okLit = DruidServe.parseIngest(
      "REPLACE INTO t OVERWRITE WHERE note = 'select me' " +
        "SELECT * FROM src PARTITIONED BY DAY").get
    assert(okLit.replaceWhere.contains("note = 'select me'"))
    // PARTITIONED BY inside a string literal in the SELECT list would
    // truncate the SELECT mid-literal
    val e2 = intercept[IllegalArgumentException](DruidServe.parseIngest(
      "INSERT INTO t SELECT 'about PARTITIONED BY x' AS note, __time " +
        "FROM src PARTITIONED BY DAY"))
    assert(e2.getMessage.contains("unbalanced"))
    // SELECT inside a WHERE string literal likewise splits mid-literal
    intercept[IllegalArgumentException](DruidServe.parseIngest(
      "REPLACE INTO t OVERWRITE WHERE note = 'a SELECT b' " +
        "SELECT * FROM src PARTITIONED BY DAY"))
    // balanced parens in a legitimate condition still parse
    val ok = DruidServe.parseIngest(
      "REPLACE INTO t OVERWRITE WHERE (__time >= TIMESTAMP '2024-01-01' " +
        "AND __time < TIMESTAMP '2024-01-02') " +
        "SELECT * FROM src PARTITIONED BY DAY").get
    assert(ok.replaceWhere.exists(_.startsWith("(")))
    // and subqueries inside the SELECT body itself remain fine
    val ok2 = DruidServe.parseIngest(
      "INSERT INTO t SELECT * FROM src WHERE a IN (SELECT a FROM b) " +
        "PARTITIONED BY DAY").get
    assert(ok2.selectSql.contains("(SELECT a FROM b)"))
  }
}
