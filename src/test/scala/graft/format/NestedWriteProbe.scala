package graft.format

/** Dev-only probe: per-stage attribution of the nested-encode write
  * premium (r11 verdict: nested carries ~40% over blob at sf10 — 16.0
  * vs 11.4 s for 10M rows — attribute it per stage and shave the
  * dominant one or document it as the irreducible shredding cost).
  *
  * Generates the s14/eventsNested JSON shape at N rows per column
  * write (the per-task unit — encoding is embarrassingly parallel
  * across tasks, so single-thread per-column cost is THE number that
  * matters) and prints NestedColumn.write's stage breakdown.
  *
  *   sbt "Test/runMain graft.format.NestedWriteProbe [rows] [reps]"
  */
object NestedWriteProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(1000000)
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    val rows = Array.tabulate(n) { i =>
      if (i % 997 == 0) null
      else {
        val k = i % 100
        val uid = i % 5000
        val v = (i % 1000) / 7.0
        val lab = if (i % 2 == 0) "even" else "odd"
        s"""{"k": $k, "m": {"uid": $uid, "v": $v}, "labels": ["l$k", "$lab"]}"""
      }
    }
    (1 to reps).foreach { rep =>
      val t0 = System.nanoTime()
      val (main, internal) = NestedColumn.write("props", rows)
      val total = (System.nanoTime() - t0) / 1e9
      val stages = NestedColumn.lastStageNanos.get()
      val bytes = main.length + internal.map(_._2.length).sum
      println(f"PROBE rep=$rep rows=$n total=$total%.2fs " +
        f"bytes=${bytes / 1024 / 1024}MB " +
        stages.map { case (s, ns) =>
          f"$s=${ns / 1e9}%.2fs(${100.0 * ns / stages.map(_._2).sum}%.0f%%)"
        }.mkString(" "))
    }
  }
}
