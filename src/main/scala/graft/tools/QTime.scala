package graft.tools

/** Dev utility: time individual query ids outside the full bench.
  *
  * Usage: sbt "runMain graft.tools.QTime <sfDir> <id1,id2,...> [runs] [prepare]"
  *
  * Same measurement hygiene as [[graft.Bench]] (noop sink, System.gc()
  * outside the timer, median-of-N) but scoped to the named ids so a
  * single-query iteration loop doesn't pay the whole suite. A trailing
  * `prepare` arg runs the build-once artifact step Bench runs
  * ([[graft.llm.Curation.prepareDecontamination]]) UNTIMED first, so
  * probes of the decontamination family measure the query like the
  * suite does, not the index build.
  */
object QTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val ids = args(1).split(",").toSeq
    val runs = if (args.length > 2) args(2).toInt else 3
    val spark = graft.Engine.session("graft-qtime")
    try {
      if (args.length > 3 && args(3) == "prepare") {
        val t0 = System.nanoTime()
        graft.llm.Curation.prepareDecontamination(spark, sfDir)
        println(f"[qtime] (prepare: decon memo build ${(System.nanoTime() - t0) / 1e9}%.3f s, untimed)")
      }
      val qs = graft.SparkEntry.queries
      ids.foreach { id =>
        val fn = qs.getOrElse(id, sys.error(s"unknown query id: $id"))
        val times = (1 to runs).map { _ =>
          System.gc()
          val t0 = System.nanoTime()
          // one failing id must not abort the rest of the list
          val ok =
            try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
            catch { case e: Throwable => System.err.println(s"[qtime] $id: $e"); false }
          if (ok) (System.nanoTime() - t0) / 1e9 else Double.NaN
        }
        val good = times.filterNot(_.isNaN).sorted
        // true median (even-size average, as in Bench) — an upper-middle
        // pick would let a steal outlier into the reported number
        val median =
          if (good.isEmpty) Double.NaN
          else if (good.size % 2 == 1) good(good.size / 2)
          else (good(good.size / 2 - 1) + good(good.size / 2)) / 2.0
        println(f"[qtime] $id%-20s median=$median%.3f s  runs=${times.map(t => f"$t%.3f").mkString(",")}")
      }
    } finally spark.stop()
  }
}
