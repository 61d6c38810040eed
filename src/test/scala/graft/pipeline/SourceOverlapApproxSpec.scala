package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

/** Gates d29's >64-source swap: sourceOverlapApprox (per-source MinHash
  * signature unions) must reproduce the EXACT gram-intersection matrix
  * (the d29 gate) within MinHash tolerance on the real sf0.01 corpus —
  * same schema, same pair set, jaccard within the k=256 estimator's
  * error band, ic within a proportional band.
  */
class SourceOverlapApproxSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestSession.spark
  private val sf = "/root/testdata/sf0.01"

  test("approx matrix matches the exact gate within MinHash tolerance") {
    val exact = graft.SparkEntry.queries("d29_source_overlap")(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    val approx = graft.queries.PipelineQueries
      .sourceOverlapApprox(graft.Tables.load(spark, sf, "documents"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    // same pair set (every source pair appears in both; the exact path
    // omits pairs with zero intersection — allow those to estimate ~0)
    exact.keys.foreach(k => assert(approx.contains(k), s"missing pair $k"))
    // jaccard: k=256 => stderr ~ sqrt(J(1-J)/256) <= 0.032; 4 sigma
    var worst = 0.0
    exact.foreach { case (pair, (icE, jE)) =>
      val (icA, jA) = approx(pair)
      val err = math.abs(jA - jE)
      worst = math.max(worst, err)
      assert(err <= 0.13, s"$pair: jaccard approx $jA vs exact $jE")
      // ic: proportional band (estimator error on J plus the
      // approx_count_distinct error on sizes)
      assert(math.abs(icA - icE) <= math.max(0.25 * icE, 200.0),
        s"$pair: ic approx $icA vs exact $icE")
    }
    // pairs absent from the exact matrix truly have ~no overlap
    (approx.keySet -- exact.keySet).foreach { pair =>
      assert(approx(pair)._2 <= 0.13, s"$pair: phantom overlap ${approx(pair)}")
    }
    info(s"worst jaccard error: $worst over ${exact.size} pairs")
  }

  test("no 64-source cap: a 100-source synthetic corpus runs clean") {
    import spark.implicits._
    val docs = (0 until 1000).map { i =>
      (i.toLong, s"src${i % 100}",
        s"document $i body with shared words " +
          (if (i % 2 == 0) "alpha beta gamma delta" else "epsilon zeta eta"))
    }.toDF("doc_id", "source", "text")
    val out = graft.queries.PipelineQueries.sourceOverlapApprox(docs, k = 64)
    assert(out.count() == 100L * 99 / 2)
    assert(out.filter(org.apache.spark.sql.functions.col("jaccard") > 0.5)
      .count() > 0, "same-parity sources share most grams")
  }
}
