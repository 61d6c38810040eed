package graft.sql

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class GraftExtensionsSpec extends AnyFunSuite {

  test("extension-injected functions survive newSession (no register calls)") {
    // newSession() builds a FRESH SessionState: temp-registered
    // functions vanish, extension-injected ones are rebuilt — so this
    // passes only through the spark.sql.extensions path.
    val fresh = SparkTestSession.spark.newSession()
    val r = fresh.sql(
      """SELECT size(grams5('hello world')),
        |       size(grams5_distinct('hello world')),
        |       intersect_count(array(1L, 2L, 3L), array(2L, 3L, 9L)),
        |       size(minhash_bands('hello world', 16, 4)),
        |       simhash5('hello world', 16) IS NOT NULL,
        |       fingerprint5('hello world') IS NOT NULL,
        |       dot_f(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
        |             array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))),
        |       hplane_proj(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), 3)
        |          IS NOT NULL""".stripMargin).head
    assert(r.getInt(0) > 0 && r.getInt(1) > 0)
    assert(r.getLong(2) == 2L)
    assert(r.getInt(3) == 4)
    assert(r.getBoolean(4) && r.getBoolean(5))
    assert(r.getDouble(6) == 11.0)
    assert(r.getBoolean(7))
    val bloom = fresh.sql(
      """WITH m AS (SELECT explode(sequence(0L, 99L)) AS k)
        |SELECT count(*) FROM m
        |WHERE NOT bloom_might(
        |  (SELECT bloom_agg(xxhash64(k), 128L, 2048L) FROM m), xxhash64(k))
        |""".stripMargin).head.getLong(0)
    assert(bloom == 0L, s"$bloom false negatives through the extension path")
  }

  test("injected and temp-registered builders agree") {
    val spark = SparkTestSession.spark
    Grams5.register(spark) // temp registration on the shared session
    val viaTemp = spark.sql("SELECT grams5('abcdefgh')").head.getSeq[Long](0)
    val viaExt = spark.newSession().sql("SELECT grams5('abcdefgh')")
      .head.getSeq[Long](0)
    assert(viaTemp == viaExt)
  }
}
