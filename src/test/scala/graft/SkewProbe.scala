package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only probe: manual ×8 salting (graft.pipeline.Skew.saltedJoin)
  * vs Spark AQE's runtime skew-join split, on a fact table with REAL
  * key skew (one hot key holding most rows) joined to a
  * too-big-to-broadcast dim. Decides q28's default implementation —
  * the verdict question is whether AQE's sort-merge skew split beats
  * the salt's ×factor dim-replication cost.
  *
  * Shapes measured (each min-of-3 after a warm pass):
  *  - plain join, AQE skew-join ON (autoBroadcast off so the dim
  *    doesn't trivially broadcast)
  *  - plain join, AQE OFF (the do-nothing baseline)
  *  - saltedJoin ×8, AQE OFF (the manual fix)
  * Prints whether AQE's plan actually marked the join skew=true.
  */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // fact: 8M rows, 60% on ONE key, rest uniform over 1M keys;
    // dim: 1M keys with a payload — too big to broadcast comfortably
    val hotFrac = 0.6
    val nFact = 8000000L
    val nKeys = 1000000L
    val fact = spark.range(nFact).select(
      when(pmod(col("id"), lit(1000)) < lit((hotFrac * 1000).toLong), lit(7L))
        .otherwise(pmod(col("id") * 2654435761L, lit(nKeys))).as("fk"),
      (col("id") % 97).cast("double").as("v"))
      .repartition(32).persist()
    val dim = spark.range(nKeys).select(col("id").as("dk"),
      concat(lit("p-"), col("id")).as("payload"))
      .repartition(32).persist()
    fact.count(); dim.count()

    def agg(j: DataFrame): Long =
      j.groupBy("payload").agg(sum("v")).count()

    def timed(tag: String)(body: => Long): Double = {
      body // warm
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }
      println(f"PROBE $tag min=${ts.min}%.2f all=${ts.map(t => f"$t%.2f").mkString(",")}")
      ts.min
    }

    def withConf[A](pairs: (String, String)*)(body: => A): A = {
      val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
      pairs.foreach { case (k, v) => spark.conf.set(k, v) }
      try body finally old.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None)    => spark.conf.unset(k)
      }
    }

    val noBroadcast = Seq("spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")

    withConf(noBroadcast ++ Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "1MB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "2MB",
      "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true"): _*) {
      val j = fact.join(dim, col("fk") === col("dk"))
      timed("aqe-skew")(agg(j))
      // did the skew split actually engage? (final adaptive plan is
      // only available AFTER execution)
      val q = j.groupBy("payload").agg(sum("v"))
      q.collect() // execute THIS plan (count() would wrap a new one)
      val planStr = q.queryExecution.executedPlan.toString
      println("PROBE aqe-skew-marked=" + planStr.contains("skew=true"))
      planStr.linesIterator.filter(l => l.contains("Join") ||
        l.contains("AQEShuffleRead")).take(6).foreach(l =>
        println("PROBE plan| " + l.trim.take(120)))
    }
    withConf(noBroadcast :+ ("spark.sql.adaptive.enabled" -> "false"): _*) {
      timed("plain-noaqe")(agg(fact.join(dim, col("fk") === col("dk"))))
      timed("salted-x8")(agg(graft.pipeline.Skew.saltedJoin(
        fact, dim, "fk", "dk", factor = 8)))
    }
    withConf(noBroadcast ++ Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8MB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8MB"): _*) {
      timed("salted-x8-aqe")(agg(graft.pipeline.Skew.saltedJoin(
        fact, dim, "fk", "dk", factor = 8)))
    }
    spark.stop()
  }
}
