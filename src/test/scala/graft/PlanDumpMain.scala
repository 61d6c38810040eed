package graft

/** Throwaway diagnostic: dump canonical plans for named queries so two
  * JVM runs can be diffed (plan-hash stability audit). Not a test.
  */
object PlanDumpMain {
  def main(args: Array[String]): Unit = {
    val names = args.head.split(",").toSeq
    val out = args(1)
    val sfDir = if (args.length > 2) args(2) else "/root/testdata/sf0.01"
    val spark = SparkTestSession.spark
    val w = new java.io.PrintWriter(out)
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, sfDir)
      df.count() // finalize the adaptive plan, exactly as Bench does
      w.println(s"===== $n")
      w.println(Bench.canonicalPlan(df))
    }
    w.close()
    spark.stop()
  }
}
