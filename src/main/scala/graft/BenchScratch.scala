package graft

import org.apache.spark.sql.SparkSession

/** DEV-ONLY scratch profiler; not part of the library. */
object BenchScratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    val names = if (args.nonEmpty) args.toSeq else Seq("d2_dedup_minhash_lsh")
    def t(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = f
      println(f"[scratch] $label%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$rows")
    }
    if (names.contains("d2parts")) {
      import org.apache.spark.sql.functions._
      import graft.pipeline.TextOps
      for (rep <- 1 to 2) {
        val docs = Tables.load(spark, sfDir, "documents")
        val bands = TextOps.bandSignaturesDirect(docs, 16, 4)
        t(s"d2.bands rep$rep")(bands.count())
        val cand = TextOps.lshCandidates(bands).cache()
        t(s"d2.cand rep$rep")(cand.count())
        val candDocs = cand.select(col("d1").as("doc_id"))
          .union(cand.select(col("d2").as("doc_id"))).distinct()
        t(s"d2.candDocs rep$rep")(candDocs.count())
        val rer = TextOps.exactJaccardDirect(
          docs.join(candDocs, Seq("doc_id"), "left_semi"), cand)
        t(s"d2.rerank rep$rep")(rer.count())
        t(s"d2.full+sort rep$rep")(
          SparkEntry.queries("d2_dedup_minhash_lsh")(spark, sfDir).count())
        cand.unpersist()
      }
    } else if (names.head == "e12parts") {
      // SQ8 build/serve attribution: quantize-once (the persisted
      // index build) vs serve-time candidate scan + re-rank over the
      // persisted quantized corpus
      import org.apache.spark.sql.functions._
      import graft.pipeline.VectorOps
      val emb = Tables.load(spark, sfDir, "embeddings")
      val q8dir = java.nio.file.Files
        .createTempDirectory("graft-sq8").toString
      t("e12.build(quantize+persist)") {
        VectorOps.sq8Quantize(emb).write.mode("overwrite").parquet(q8dir)
        spark.read.parquet(q8dir).count()
      }
      val q8 = spark.read.parquet(q8dir)
      for (rep <- 1 to 2)
        t(s"e12.serve rep$rep")(VectorOps.sq8TopK(emb, col("vec_id") < 3,
          k = 5, candPool = 20, precomputedQ8 = Some(q8)).count())
      for (rep <- 1 to 2)
        t(s"e1.brute rep$rep")(VectorOps.bruteTopK(emb,
          emb.filter(col("vec_id") < 3), 5).count())
    } else if (names.head == "nestedwrite") {
      // nested-vs-blob write premium at volume (r11 measured 16.0 vs
      // 11.4 s at sf10 pre-optimization; the r12 encoder shaves the
      // dictionary stages) — same segment-writer path s14 rides
      import org.apache.spark.sql.functions._
      val ev = Tables.load(spark, sfDir, "events")
        .select(col("ts").as("__time"), col("event_type"),
          struct(
            get_json_object(col("props"), "$.k").cast("long").as("k"),
            struct(col("user_id").as("uid"), col("value").as("v"))
              .as("m")).as("props"))
      val base = java.nio.file.Files
        .createTempDirectory("graft-nw").toString
      t("read+transform(noop count)")(ev.count())
      for (rep <- 1 to 2) {
        t(s"write.blob rep$rep") {
          ev.write.format("druid").option("complexTypes", "props:json")
            .mode("overwrite").save(s"$base/blob")
          spark.read.format("druid").load(s"$base/blob").count()
        }
        t(s"write.nested rep$rep") {
          ev.write.format("druid").option("complexTypes", "props:json")
            .option("jsonEncoding", "nested")
            .mode("overwrite").save(s"$base/nested")
          spark.read.format("druid").load(s"$base/nested").count()
        }
      }
    } else if (names.head == "jobs") {
      import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
      val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
      spark.sparkContext.addSparkListener(new SparkListener {
        override def onJobStart(js: SparkListenerJobStart): Unit =
          starts.put(js.jobId, (System.nanoTime(),
            js.stageInfos.map(_.name.takeWhile(_ != '\n')).mkString("|").take(120)))
        override def onJobEnd(je: SparkListenerJobEnd): Unit = {
          val (t0, desc) = starts.getOrDefault(je.jobId, (0L, "?"))
          println(f"[job] ${je.jobId}%3d ${(System.nanoTime() - t0) / 1e9}%7.3f s  $desc")
        }
      })
      for (n <- names.tail; rep <- 1 to 2)
        t(s"$n rep$rep")(SparkEntry.queries(n)(spark, sfDir).count())
      Thread.sleep(500)
    } else if (names.head == "ccstar") {
      // connected-components implementation shootout on d18's real
      // edge input at the current SF: hash-min propagation (primary)
      // vs large-star/small-star contraction (fallback) vs the
      // driver-side union-find with the gate lifted
      import org.apache.spark.sql.functions._
      val docs = Tables.load(spark, sfDir, "documents")
      val bandsDir = graft.queries.PipelineQueries.lshBandsDir(spark, sfDir)
      val cand = graft.pipeline.TextOps.lshConnectivityEdges(
        spark.read.parquet(bandsDir)).localCheckpoint()
      t("edges")(cand.count())
      for (rep <- 1 to 2) {
        t(s"hashmin rep$rep")(
          graft.pipeline.Components.connectedComponents(cand)
            .groupBy(col("component")).count().count())
        t(s"star rep$rep")(
          graft.pipeline.Components.connectedComponentsStar(cand)
            .groupBy(col("component")).count().count())
        t(s"local rep$rep")(
          graft.pipeline.Components.connectedComponents(cand,
              localEdgeLimit = Long.MaxValue)
            .groupBy(col("component")).count().count())
      }
    } else if (names.head == "wave3") {
      // sf10 wave-3 per-stage attribution: d15 (3.7x at 10x), d20
      // (4.2x), q28 (3.5x) — name the stage that grows or the fixed
      // cost that amortizes
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.expressions.Window
      for (rep <- 1 to 2) {
        // ---- d15 TF-IDF ----
        val docs = Tables.load(spark, sfDir, "documents")
        val tc = docs
          .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
          .groupBy(col("doc_id"), col("word"))
          .agg(count(lit(1)).as("tf")).cache()
        t(s"d15.tc(explode+groupBy) rep$rep")(tc.count())
        val dfx = tc.groupBy(col("word")).agg(count(lit(1)).as("df")).cache()
        t(s"d15.dfx(vocab) rep$rep")(dfx.count()) // row count = |vocab|
        val nn = docs.agg(count(lit(1)).as("n_docs"))
        val scored = tc.join(broadcast(dfx), "word").crossJoin(broadcast(nn))
          .withColumn("score",
            col("tf") * col("n_docs").cast("double") / col("df"))
        t(s"d15.join+score rep$rep")(scored.count())
        val w = Window.partitionBy(col("doc_id"))
          .orderBy(col("score").desc, col("word"))
        t(s"d15.window-top3 rep$rep")(
          scored.withColumn("rk", row_number().over(w))
            .filter(col("rk") <= 3).count())
        tc.unpersist(); dfx.unpersist()
        t(s"d15.full rep$rep")(
          SparkEntry.queries("d15_tfidf_keywords")(spark, sfDir).count())
        // ---- d20 k-means refine ----
        import graft.pipeline.VectorOps
        val emb = Tables.load(spark, sfDir, "embeddings")
        val a1 = VectorOps.ivfAssign(emb, 8).cache()
        t(s"d20.assign1 rep$rep")(a1.count())
        val cent2 = emb.join(a1, "vec_id")
          .select(col("cell"), posexplode(col("embedding")).as(Seq("pos", "v")))
          .groupBy(col("cell"), col("pos"))
          .agg(round(avg(col("v")), 4).as("cv1"))
          .groupBy(col("cell"))
          .agg(expr("transform(array_sort(collect_list(struct(pos, cv1))), x -> x.cv1)").as("cv"))
        t(s"d20.recenter rep$rep")(cent2.count())
        a1.unpersist()
        t(s"d20.full rep$rep")(
          SparkEntry.queries("d20_kmeans_refine")(spark, sfDir).count())
        // ---- q28 salted join ----
        import graft.pipeline.Skew
        val li = Tables.load(spark, sfDir, "lineitem")
        val ord = Tables.load(spark, sfDir, "orders")
          .select(col("o_orderkey"), col("o_orderpriority"))
        t(s"q28.join-only rep$rep")(
          Skew.saltedJoin(li, ord, "l_orderkey", "o_orderkey", 8,
            "inner").count())
        t(s"q28.full rep$rep")(
          SparkEntry.queries("q28_salted_join")(spark, sfDir).count())
        // unsalted reference: what AQE does without the manual salt
        t(s"q28.unsalted-ref rep$rep")(
          li.join(ord, col("l_orderkey") === col("o_orderkey"))
            .groupBy(col("o_orderpriority"))
            .agg(sum(col("l_quantity")), count(lit(1))).count())
      }
    } else if (names.head == "d13parts") {
      // d13 stage attribution: how much of the dominant survivor-
      // materialization job is the marker-count/word-count string
      // arithmetic vs the dedup window vs the cache build
      import org.apache.spark.sql.functions._
      import graft.pipeline.TextOps
      val en = TextOps.markerCountSql("the")
      val art = TextOps.markerCountSql("a")
      val wc = TextOps.wordCountSql
      for (rep <- 1 to 2) {
        val docs = Tables.load(spark, sfDir, "documents")
        t(s"d13.scan-only rep$rep")(
          docs.select(sum(length(col("text")))).count())
        t(s"d13.filter-exprs rep$rep")(
          docs.filter(expr(s"($en) + ($art) >= 3 AND ($wc) >= 10")).count())
        val filtered = docs.filter(expr(s"($en) + ($art) >= 3 AND ($wc) >= 10"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(xxhash64(lower(col("text"))), length(col("text")))
          .orderBy(col("doc_id"))
        t(s"d13.filter+window rep$rep")(filtered
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1).count())
        spark.catalog.clearCache()
        t(s"d13.full rep$rep")(
          SparkEntry.queries("d13_curation_pipeline")(spark, sfDir).count())
        spark.catalog.clearCache()
      }
    } else if (names.head == "m6parts") {
      // per-stage attribution of the video keyframe near-dup COLD cost
      import graft.pipeline.Multimodal
      val docs = Tables.load(spark, sfDir, "documents")
      val frames = Multimodal.videoFrames(docs)
      for (rep <- 1 to 2) {
        spark.catalog.clearCache()
        t(s"m6.frames rep$rep")(frames.count())
        val bands = Multimodal.aHashBands(frames).cache()
        t(s"m6.bandsMat rep$rep")(bands.count())
        t(s"m6.bandsWarm rep$rep")(bands.count())
        bands.unpersist()
        spark.catalog.clearCache()
        t(s"m6.full rep$rep")(
          SparkEntry.queries("m6_video_keyframe_neardup")(spark, sfDir).count())
      }
    } else if (names.head == "warmed") {
      for (n <- names.tail) {
        try SparkEntry.queries(n)(spark, "/root/testdata/sf0.001").count()
        catch { case _: Throwable => () }
        t(s"$n warm@0.001->0.1")(SparkEntry.queries(n)(spark, sfDir).count())
        t(s"$n rep2@0.1")(SparkEntry.queries(n)(spark, sfDir).count())
      }
    } else if (names.head == "explain") {
      for (n <- names.tail) {
        println(s"==== $n ====")
        val df = SparkEntry.queries(n)(spark, sfDir)
        df.collect() // resolve AQE final plan
        println(df.queryExecution.executedPlan.toString.take(8000))
      }
    } else if (names.head == "planfile") {
      // Write .explain("formatted") per query to <outdir>/<name>.txt —
      // the round's plans/r14/*_{before,after}.txt evidence files.
      val outDir = names(1)
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
      for (n <- names.drop(2)) {
        val df = SparkEntry.queries(n)(spark, sfDir)
        df.count() // materialize so AQE/caches resolve like the bench run
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(outDir, s"$n.txt"), txt)
        println(s"[planfile] wrote $outDir/$n.txt (${txt.length} chars)")
      }
    } else if (names.head == "streamprof") {
      // Per-micro-batch duration breakdown for the streaming gates:
      // a StreamingQueryListener dumps each progress' durationMs map
      // (addBatch / getBatch / latestOffset / queryPlanning /
      // walCommit / commitOffsets) + state-store metrics.
      import org.apache.spark.sql.streaming.StreamingQueryListener
      spark.streams.addListener(new StreamingQueryListener {
        override def onQueryStarted(
            e: StreamingQueryListener.QueryStartedEvent): Unit = ()
        override def onQueryProgress(
            e: StreamingQueryListener.QueryProgressEvent): Unit = {
          val p = e.progress
          val dm = p.durationMs
          println(f"[sp] batch=${p.batchId}%2d rows=${p.numInputRows}%6d " +
            f"trigger=${dm.getOrDefault("triggerExecution", -1L)}%5d " +
            f"addBatch=${dm.getOrDefault("addBatch", -1L)}%5d " +
            f"getBatch=${dm.getOrDefault("getBatch", -1L)}%4d " +
            f"latestOffset=${dm.getOrDefault("latestOffset", -1L)}%4d " +
            f"plan=${dm.getOrDefault("queryPlanning", -1L)}%4d " +
            f"walCommit=${dm.getOrDefault("walCommit", -1L)}%4d " +
            f"commitOffsets=${dm.getOrDefault("commitOffsets", -1L)}%4d " +
            p.stateOperators.map(so =>
              s"state[rows=${so.numRowsTotal} commit=${so.commitTimeMs}ms]")
              .mkString(" "))
        }
        override def onQueryTerminated(
            e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      })
      for (n <- names.tail; rep <- 1 to 2) {
        t(s"$n rep$rep")(SparkEntry.queries(n)(spark, sfDir).count())
        Thread.sleep(300) // let async listener drain before next label
      }
    } else for (n <- names; rep <- 1 to 2) {
      t(s"$n rep$rep")(SparkEntry.queries(n)(spark, sfDir).count())
    }
    spark.stop()
  }
}
