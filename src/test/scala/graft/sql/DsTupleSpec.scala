package graft.sql

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Tuple (arrayOfDoubles) sketch family: build aggregate exactness in
  * the theta==1 regime, distributed merge = single-partition truth,
  * blob merge (ds_tuple_merge), set operations with Druid's sum
  * combiner, estimation-mode degradation, and wire round-trip through
  * the real DataSketches library.
  */
class DsTupleSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = graft.SparkTestSession.spark
    DruidSqlCompat.register(s)
    s
  }

  test("exact regime: estimate is the distinct count, sums are true sums") {
    import spark.implicits._
    // 40 keys, each appearing several times with two metric columns
    val rows = (1 to 400).map(i => (i % 40L, (i % 7).toDouble, (i % 3).toDouble))
    val out = rows.toDF("k", "m1", "m2").repartition(8)
      .agg(expr("ds_tuple(k, array(m1, m2), 1024)").as("sk"))
      .select(expr("ds_tuple_estimate(sk)").as("est"),
        expr("ds_tuple_n(sk)").as("n"),
        expr("ds_tuple_metrics_sum(sk)").as("sums"))
      .head()
    assert(out.getDouble(0) == 40.0)
    assert(out.getLong(1) == 40L)
    val sums = out.getSeq[Double](2)
    assert(sums(0) == rows.map(_._2).sum)
    assert(sums(1) == rows.map(_._3).sum)
  }

  test("empty group carries the declared metric arity, not a 1-element default") {
    import spark.implicits._
    // all keys null -> the buffer never sees a row; the empty sketch
    // must still be sized to the DECLARED arity so
    // ds_tuple_metrics_sum answers [0.0, 0.0] and element_at(sums, 2)
    // is 0.0, not null (ADVICE r11: numberOfValues=1 default)
    val out = Seq((null.asInstanceOf[java.lang.Long], 1.0, 2.0))
      .toDF("k", "m1", "m2")
      .agg(expr("ds_tuple(k, array(m1, m2), 1024)").as("sk"))
      .select(expr("ds_tuple_estimate(sk)").as("est"),
        expr("ds_tuple_metrics_sum(sk)").as("sums"))
      .head()
    assert(out.getDouble(0) == 0.0)
    val sums = out.getSeq[Double](1)
    assert(sums == Seq(0.0, 0.0), s"empty-group sums: $sums")
  }

  test("distributed merge equals single-partition truth") {
    import spark.implicits._
    val rows = (1 to 3000).map(i => (s"key${i % 83}", (i % 11).toDouble))
    def run(parts: Int) =
      rows.toDF("k", "m").repartition(parts)
        .agg(expr("ds_tuple(k, array(m), 256)").as("sk"))
        .select(expr("ds_tuple_estimate(sk)"), expr("ds_tuple_metrics_sum(sk)"))
        .head()
    val (a, b) = (run(1), run(16))
    assert(a.getDouble(0) == b.getDouble(0))
    assert(a.getSeq[Double](1) == b.getSeq[Double](1))
  }

  test("ds_tuple_merge folds pre-built blobs (two-level aggregation)") {
    import spark.implicits._
    val df = (1 to 500).map(i => (s"g${i % 5}", i % 50L, 1.0))
      .toDF("g", "k", "m").repartition(8)
    val twoLevel = df.groupBy("g").agg(expr("ds_tuple(k, array(m), 256)").as("sk"))
      .agg(expr("ds_tuple_merge(sk, 256)").as("sk2"))
      .select(expr("ds_tuple_estimate(sk2)").as("est"),
        expr("ds_tuple_metrics_sum(sk2)").as("sums"))
      .head()
    assert(twoLevel.getDouble(0) == 50.0)
    assert(twoLevel.getSeq[Double](1) == Seq(500.0))
  }

  test("set ops: union sums shared keys, intersect keeps common, NOT subtracts") {
    import spark.implicits._
    val a = (1 to 20).map(i => (i.toLong, 1.0)).toDF("k", "m")
      .agg(expr("ds_tuple(k, array(m), 64)").as("sk")).head().getAs[Array[Byte]](0)
    val b = (11 to 30).map(i => (i.toLong, 2.0)).toDF("k", "m")
      .agg(expr("ds_tuple(k, array(m), 64)").as("sk")).head().getAs[Array[Byte]](0)
    val df = Seq((a, b)).toDF("a", "b")
    val r = df.select(
      expr("ds_tuple_estimate(ds_tuple_union(a, b, 64))").as("u_est"),
      expr("ds_tuple_metrics_sum(ds_tuple_union(a, b, 64))").as("u_sums"),
      expr("ds_tuple_estimate(ds_tuple_intersect(a, b, 64))").as("i_est"),
      expr("ds_tuple_metrics_sum(ds_tuple_intersect(a, b, 64))").as("i_sums"),
      expr("ds_tuple_estimate(ds_tuple_not(a, b))").as("d_est"))
      .head()
    assert(r.getDouble(0) == 30.0) // 1..30
    assert(r.getSeq[Double](1) == Seq(20.0 * 1.0 + 20.0 * 2.0))
    assert(r.getDouble(2) == 10.0) // 11..20
    assert(r.getSeq[Double](3) == Seq(10.0 * 1.0 + 10.0 * 2.0)) // summed
    assert(r.getDouble(4) == 10.0) // 1..10
  }

  test("past nominalEntries the sketch degrades to estimation mode, not failure") {
    import spark.implicits._
    val out = (1 to 5000).map(i => (i.toLong, 1.0)).toDF("k", "m")
      .repartition(8)
      .agg(expr("ds_tuple(k, array(m), 64)").as("sk"))
      .select(expr("ds_tuple_estimate(sk)").as("est"),
        expr("ds_tuple_n(sk)").as("n"))
      .head()
    // theta < 1: retained entries bounded, estimate in the ballpark
    assert(out.getLong(1) <= 2 * 64)
    assert(math.abs(out.getDouble(0) - 5000.0) / 5000.0 < 0.5)
  }

  test("blobs are real DataSketches wire format (library round-trip)") {
    import spark.implicits._
    val blob = (1 to 25).map(i => (i.toLong, i.toDouble)).toDF("k", "m")
      .agg(expr("ds_tuple(k, array(m), 128)").as("sk"))
      .head().getAs[Array[Byte]](0)
    val sk = org.apache.datasketches.tuple.arrayofdoubles.ArrayOfDoublesSketches
      .heapifySketch(org.apache.datasketches.memory.Memory.wrap(blob))
    assert(sk.getEstimate == 25.0)
    assert(sk.getNumValues == 1)
    var total = 0.0
    val it = sk.iterator()
    while (it.next()) total += it.getValues()(0)
    assert(total == (1 to 25).map(_.toDouble).sum)
  }

  test("Druid SQL wire names: DS_TUPLE_DOUBLES family with trailing nominalEntries") {
    import spark.implicits._
    (1 to 400).map(i => (i % 40L, (i % 7).toDouble, (i % 3).toDouble))
      .toDF("k", "m1", "m2").createOrReplaceTempView("tup_sql")
    // two metric columns + the trailing integer-literal nominalEntries
    val r = spark.sql(
      """SELECT ds_tuple_doubles_estimate(sk) AS est,
        |       ds_tuple_doubles_metrics_sum_estimate(sk) AS sums
        |FROM (SELECT DS_TUPLE_DOUBLES(k, m1, m2, 1024) AS sk
        |      FROM tup_sql)""".stripMargin).head()
    assert(r.getDouble(0) == 40.0)
    assert(r.getSeq[Double](1).length == 2)
    // without the trailing literal every arg past the key is a metric
    val r2 = spark.sql(
      """SELECT ds_tuple_doubles_metrics_sum_estimate(
        |         DS_TUPLE_DOUBLES(k, m1, m2)) AS sums
        |FROM tup_sql""".stripMargin).head()
    assert(r2.getSeq[Double](0).length == 2)
  }

  test("null keys and null metric elements follow the numeric-null fold") {
    import spark.implicits._
    val df = Seq((Some(1L), Some(2.0)), (None, Some(9.0)),
      (Some(2L), None), (Some(1L), Some(3.0)))
      .toDF("k", "m")
    val out = df.agg(expr("ds_tuple(k, array(m), 64)").as("sk"))
      .select(expr("ds_tuple_estimate(sk)").as("est"),
        expr("ds_tuple_metrics_sum(sk)").as("sums"))
      .head()
    // null key skipped; null metric element counts as 0 for key 2
    assert(out.getDouble(0) == 2.0)
    assert(out.getSeq[Double](1) == Seq(5.0))
  }
}
