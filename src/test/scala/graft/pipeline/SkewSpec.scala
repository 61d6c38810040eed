package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class SkewSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // a pathologically skewed fact: 90% of rows share key 1
  private lazy val fact = (0 until 10000)
    .map(i => (if (i % 10 == 0) (i % 50).toLong else 1L, i.toLong))
    .toDF("k", "payload")
  private lazy val dim = (0 until 50)
    .map(i => (i.toLong, s"name_$i")).toDF("dk", "name")

  test("salted inner join equals the plain join") {
    val plain = fact.join(dim, fact("k") === dim("dk"))
    val salted = Skew.saltedJoin(fact, dim, "k", "dk", factor = 8)
    assert(salted.columns.toSeq == plain.columns.toSeq)
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("salted left join preserves unmatched fact rows") {
    val factWithMiss = fact.union(Seq((999L, -1L)).toDF("k", "payload"))
    val plain = factWithMiss.join(dim,
      factWithMiss("k") === dim("dk"), "left")
    val salted = Skew.saltedJoin(factWithMiss, dim, "k", "dk",
      factor = 4, joinType = "left")
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
    assert(salted.filter(col("k") === 999L).count() == 1)
  }

  test("join runs on (key, salt): hot key spreads over factor sub-keys") {
    // with broadcast off, the shuffle must hash on both key and salt —
    // that compound key is the entire point of the transform
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val df = Skew.saltedJoin(fact, dim, "k", "dk", factor = 8)
      df.collect()
      val p = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      assert(p.contains("__graft_salt"),
        s"salt column missing from the executed join:\n$p")
      val joinLine = p.linesIterator
        .find(l => l.contains("SortMergeJoin") || l.contains("ShuffledHashJoin"))
      assert(joinLine.exists(_.contains("__graft_salt")),
        s"join keys do not include the salt:\n$p")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("hotKeySaltedJoin equals the plain join; only hot keys salt") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plain = fact.join(dim, fact("k") === dim("dk"))
      // key 1 holds 9000 rows, every other key 20: threshold 100
      // salts EXACTLY key 1
      val hot = Skew.hotKeySaltedJoin(fact, dim, "k", "dk",
        factor = 8, hotThreshold = 100)
      assert(hot.exceptAll(plain).isEmpty && plain.exceptAll(hot).isEmpty)
      hot.collect()
      val p = hot.queryExecution.executedPlan.toString
      assert(p.contains("__graft_salt"), "hot slice must be salted")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("hotKeySaltedJoin left join preserves unmatched + null-key fact rows") {
    val factX = fact.union(Seq((999L, -1L)).toDF("k", "payload"))
      .union(Seq((null.asInstanceOf[java.lang.Long], -2L))
        .toDF("k", "payload"))
    val plain = factX.join(dim, factX("k") === dim("dk"), "left")
    val hot = Skew.hotKeySaltedJoin(factX, dim, "k", "dk",
      factor = 4, hotThreshold = 100, joinType = "left")
    assert(hot.exceptAll(plain).isEmpty && plain.exceptAll(hot).isEmpty)
    assert(hot.filter(col("k").isNull).count() == 1)
    assert(hot.filter(col("k") === 999L).count() == 1)
  }

  test("hotKeySaltedJoin with no hot key degrades to the plain join") {
    val uniform = (0 until 1000)
      .map(i => ((i % 50).toLong, i.toLong)).toDF("k", "payload")
    val df = Skew.hotKeySaltedJoin(uniform, dim, "k", "dk",
      factor = 8, hotThreshold = 100)
    assert(!df.queryExecution.analyzed.toString.contains("__graft_salt"),
      "no-hot-key case must not salt anything")
    assert(df.count() == 1000)
  }

  test("hotKeySaltedJoin fails loudly when 'hot' keys are not few") {
    val uniform = (0 until 10000)
      .map(i => ((i % 5000).toLong, i.toLong)).toDF("k", "payload")
    val e = intercept[IllegalArgumentException] {
      Skew.hotKeySaltedJoin(uniform, dim, "k", "dk",
        factor = 8, hotThreshold = 1, maxHotKeys = 100)
    }
    assert(e.getMessage.contains("not 'few hot keys'"))
  }

  test("dim-preserving join types are rejected") {
    intercept[IllegalArgumentException](
      Skew.saltedJoin(fact, dim, "k", "dk", 4, joinType = "right"))
    intercept[IllegalArgumentException](
      Skew.saltedJoin(fact, dim, "k", "dk", 0))
  }

  test("semanticDedup maxCell bounds the hot-cell pair explosion") {
    // the deliberately collapsed corpus d24's guard exists for: 4
    // one-hot seed centroids, then 300 identical copies of centroid
    // 0's vector — ivfAssign drops every copy into ONE cell (n=301),
    // the quadratic skew bomb at scale
    val nDim = 8
    def oneHot(j: Int): Array[Float] =
      Array.tabulate(nDim)(i => if (i == j) 1.0f else 0.0f)
    val rows = (0 until 4).map(j => (j.toLong, oneHot(j))) ++
      (4 until 304).map(i => (i.toLong, oneHot(0)))
    val emb = rows.toDF("vec_id", "embedding")
    val assign = VectorOps.ivfAssign(emb, 4)
    val withVec = emb.join(assign, "vec_id")
    assert(assign.filter(col("cell") === 0L).count() == 301L)
    // uncapped: the hot cell alone emits n(n-1)/2 pairs
    val uncapped = VectorOps.semanticPairs(withVec, None).count()
    assert(uncapped == 301L * 300L / 2 + 0L, s"uncapped=$uncapped")
    // capped at 10: each member pairs only with its cell's 10 lowest
    // ids — sum_{r=1..10}(301-r) = 2955, linear in cell size
    val capped = VectorOps.semanticPairs(withVec, Some(10)).count()
    assert(capped == (1 to 10).map(301L - _).sum, s"capped=$capped")
    // coverage on the collapsed mass is unchanged: both runs keep
    // exactly the lowest id of the collapsed cell and drop the rest
    def dropped(maxCell: Option[Int]): Set[Long] =
      VectorOps.semanticDedup(emb, 4, 0.9, maxCell)
        .filter(col("drop")).select("vec_id")
        .collect().map(_.getLong(0)).toSet
    val full = dropped(None)
    assert(full == (4L until 304L).toSet, s"uncapped drop set $full")
    assert(dropped(Some(10)) == full)
    // a cap at/above every cell size is the identity
    assert(VectorOps.semanticPairs(withVec, Some(301)).count() == uncapped)
  }
}
