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

  test("dim-preserving join types are rejected") {
    intercept[IllegalArgumentException](
      Skew.saltedJoin(fact, dim, "k", "dk", 4, joinType = "right"))
    intercept[IllegalArgumentException](
      Skew.saltedJoin(fact, dim, "k", "dk", 0))
  }
}
