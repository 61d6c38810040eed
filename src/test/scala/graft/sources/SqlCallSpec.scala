package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.druid.SegmentCatalog

/** SQL `CALL` surface (Spark 4 ProcedureCatalog on GraftCatalog):
  * compact / compact_full / retain run the maintenance operators and
  * return their stats as the CALL result row.
  */
class SqlCallSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestSession.spark

  private val day = 86400000L
  private val base = 1700006400000L // 2023-11-15T00:00Z

  // ONE root for the whole spec: Spark caches catalog instances per
  // session, so re-pointing gcall.root between tests would not take
  private lazy val root = Files.createTempDirectory("graft-call").toString

  private def freshTable(name: String): (String, String) = {
    import spark.implicits._
    // 6 small segments: 3 days x repartition(2)
    (0 until 3).foreach { d =>
      (0 until 500).map(i => (base + d * day + i * 1000L, s"u${i % 7}", i.toLong))
        .toDF("__time", "who", "n").repartition(2)
        .write.format("druid").mode(if (d == 0) "overwrite" else "append")
        .save(s"$root/$name")
    }
    (root, s"$root/$name")
  }

  private def withCat[T](root: String)(f: => T): T = {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.catalog.gcall" -> conf.getOption("spark.sql.catalog.gcall"),
      "spark.sql.catalog.gcall.root" -> conf.getOption("spark.sql.catalog.gcall.root"))
    conf.set("spark.sql.catalog.gcall",
      classOf[graft.sources.druid.GraftCatalog].getName)
    conf.set("spark.sql.catalog.gcall.root", root)
    try f
    finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  test("CALL system.compact merges undersized segments and reports stats") {
    val (root, dir) = freshTable("t1")
    withCat(root) {
      assert(SegmentCatalog.metaFor(dir).size == 6)
      val before = spark.table("gcall.t1").agg(sum("n")).head().getLong(0)
      val st = spark.sql("CALL gcall.system.compact('t1', 100000)").head()
      assert(st.getLong(0) == 1500L, s"rows_rewritten: $st")
      assert(st.getInt(1) == 6 && st.getInt(2) == 1, s"segment counts: $st")
      assert(SegmentCatalog.metaFor(dir).size == 1)
      assert(spark.table("gcall.t1").agg(sum("n")).head().getLong(0) == before)
      // idempotent: fewer than 2 undersized segments -> no rewrite
      val st2 = spark.sql("CALL gcall.system.compact('t1', 100000)").head()
      assert(st2.getLong(0) == 0L && st2.getInt(2) == 1, s"second call: $st2")
    }
  }

  test("CALL system.compact_full re-clusters with cluster_by") {
    val (root, dir) = freshTable("t2")
    withCat(root) {
      val st = spark.sql(
        "CALL gcall.system.compact_full('t2', 800, 'who')").head()
      assert(st.getLong(0) == 1500L)
      val metas = SegmentCatalog.metaFor(dir)
      assert(metas.size == 2, s"expected ceil(1500/800) = 2: ${metas.size}")
      // clustered: 'who' envelopes are narrow slices, not the full span
      val envs = metas.map(_.strZones("who")).sortBy(_._1)
      assert(envs.head._2 <= envs.last._1,
        s"cluster_by produced overlapping envelopes: $envs")
      assert(spark.table("gcall.t2").count() == 1500L)
    }
  }

  test("CALL system.retain drops whole old segments metadata-only") {
    val (root, dir) = freshTable("t3")
    withCat(root) {
      // 2023-11-17T00:00Z = base + 2 days: days 0 and 1 end at or
      // before it, day 2 survives
      val st = spark.sql(
        s"CALL gcall.system.retain('t3', TIMESTAMP '2023-11-17 00:00:00+00')")
        .head()
      assert(st.getInt(0) == 4, s"dropped (2 days x 2 segments): $st")
      assert(st.getLong(1) == 1000L && st.getInt(2) == 2, s"stats: $st")
      assert(SegmentCatalog.metaFor(dir).size == 2)
      assert(spark.table("gcall.t3").count() == 500L)
    }
  }

  test("CALL system.purge_trash reclaims expired tombstones, honors grace") {
    val (root, dir) = freshTable("t5")
    withCat(root) {
      // compaction tombstones the 6 replaced segments (deferred delete)
      spark.sql("CALL gcall.system.purge_trash('t5', 0)").head() // clean slate
      val st = spark.sql("CALL gcall.system.compact('t5', 100000)").head()
      assert(st.getInt(2) == 1)
      val trashed = {
        val s = java.nio.file.Files.list(java.nio.file.Paths.get(dir))
        try {
          import scala.jdk.CollectionConverters._
          s.iterator().asScala.count(p =>
            SegmentCatalog.isTombstoned(p))
        } finally s.close()
      }
      assert(trashed == 6, s"expected 6 tombstoned dirs, found $trashed")
      // long grace: nothing reclaimed; the dirs stay openable
      val p0 = spark.sql(
        "CALL gcall.system.purge_trash('t5', 3600000)").head()
      assert(p0.getInt(0) == 0, s"purged during grace: $p0")
      // grace 0: all six reclaim, table intact
      val p1 = spark.sql("CALL gcall.system.purge_trash('t5', 0)").head()
      assert(p1.getInt(0) == 6, s"expected 6 purged: $p1")
      assert(spark.table("gcall.t5").count() == 1500L)
      assert(SegmentCatalog.metaFor(dir).size == 1)
    }
  }

  test("CALL on a missing table or procedure is loud") {
    val (root, _) = freshTable("t4")
    withCat(root) {
      val e1 = intercept[Exception] {
        spark.sql("CALL gcall.system.compact('nope', 1000)").head()
      }
      assert(e1.getMessage.contains("no segment table"),
        s"unexpected: ${e1.getMessage}")
      val e2 = intercept[Exception] {
        spark.sql("CALL gcall.system.vacuum('t4')").head()
      }
      assert(e2.getMessage.toLowerCase.contains("not found") ||
        e2.getMessage.toLowerCase.contains("vacuum"))
      // unknown procedures surface as the analyzer's standard
      // ROUTINE_NOT_FOUND (sqlState 42883), not an internal error
      assert(e2.isInstanceOf[org.apache.spark.sql.AnalysisException],
        s"expected AnalysisException, got ${e2.getClass}")
      assert(e2.asInstanceOf[org.apache.spark.sql.AnalysisException]
        .getCondition == "ROUTINE_NOT_FOUND")
    }
  }
}
