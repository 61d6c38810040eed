package graft.sql

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Frequent-Items build aggregate (ds_freq) + blob helpers: exact
  * regime vs purge regime, distributed merge = single-partition
  * result, blob-merge child dispatch, and the topK total order.
  */
class DsFreqSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = graft.SparkTestSession.spark
    DruidSqlCompat.register(s)
    s
  }

  test("exact regime: estimates are true counts and max_err is 0") {
    import spark.implicits._
    val rows = (1 to 100).flatMap(i => Seq.fill(i % 7 + 1)(s"tok${i % 13}"))
    val df = rows.toDF("tok").repartition(8)
    val out = df.agg(expr("ds_freq(tok, 128)").as("sk"))
      .select(expr("ds_freq_max_error(sk)").as("err"),
        expr("ds_freq_topk(sk, 3)").as("top"),
        expr("ds_freq_estimate(sk, 'tok0')").as("e0"))
      .head()
    assert(out.getLong(0) == 0L, "128-slot sketch over 13 items must be exact")
    val exact = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(out.getLong(2) == exact("tok0"))
    val top = out.getSeq[org.apache.spark.sql.Row](1)
      .map(r => (r.getString(0), r.getLong(1)))
    val expected = exact.toSeq.sortBy { case (t, n) => (-n, t) }.take(3)
    assert(top == expected, s"topk mismatch: $top vs $expected")
  }

  test("distributed merge equals single-partition truth") {
    import spark.implicits._
    val rows = (1 to 5000).map(i => s"t${i % 97}")
    def topk(parts: Int) =
      rows.toDF("tok").repartition(parts)
        .agg(expr("ds_freq(tok, 256)").as("sk"))
        .select(expr("ds_freq_topk(sk, 10)").as("top"))
        .head().getSeq[org.apache.spark.sql.Row](0)
        .map(r => (r.getString(0), r.getLong(1)))
    assert(topk(1) == topk(16))
  }

  test("binary child merges pre-built blobs (two-level aggregation)") {
    import spark.implicits._
    val df = (1 to 400).map(i => (s"g${i % 4}", s"tok${i % 11}"))
      .toDF("g", "tok").repartition(8)
    val merged = df.groupBy("g").agg(expr("ds_freq(tok, 64)").as("sk"))
      .agg(expr("ds_freq(sk, 64)").as("sk2"))
      .select(expr("ds_freq_estimate(sk2, 'tok3')")).head().getLong(0)
    val direct = df.agg(expr("ds_freq(tok, 64)").as("sk"))
      .select(expr("ds_freq_estimate(sk, 'tok3')")).head().getLong(0)
    assert(merged == direct && direct == 400L / 11 + (if (3 < 400 % 11) 1 else 0))
  }

  test("purge regime is loud through max_err, not wrong") {
    import spark.implicits._
    // 1000 distinct items through an 8-slot sketch: must purge
    val rows = (1 to 1000).map(i => s"u$i") ++ Seq.fill(500)("heavy")
    val out = rows.toDF("tok").repartition(4)
      .agg(expr("ds_freq(tok, 8)").as("sk"))
      .select(expr("ds_freq_max_error(sk)").as("err"),
        expr("ds_freq_topk(sk, 1)").as("top")).head()
    val err = out.getLong(0)
    assert(err > 0L, "1000 distinct through 8 slots must report error > 0")
    val (item, est) = {
      val r = out.getSeq[org.apache.spark.sql.Row](1).head
      (r.getString(0), r.getLong(1))
    }
    // the true heavy hitter survives the purges and its estimate
    // brackets the true count within the reported error
    assert(item == "heavy")
    assert(est >= 500L && est <= 500L + err)
  }

  test("ds_freq rejects non-power-of-2 map sizes") {
    import spark.implicits._
    val e = intercept[Exception] {
      Seq("a").toDF("tok").agg(expr("ds_freq(tok, 100)")).head()
    }
    assert(e.getMessage.contains("power of 2"))
  }
}
