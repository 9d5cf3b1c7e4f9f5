package graft.tools

/** Dev probe: run query ids with a job-level listener — per-job wall
  * time and description — to attribute multi-job query cost (guide §1).
  *
  * Usage: sbt "runMain graft.tools.JTime <sfDir> <id1,id2,...> [runs]"
  */
object JTime {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val ids = args(1).split(",").toSeq
    val runs = if (args.length > 2) args(2).toInt else 2
    val s = graft.Engine.session("graft-jtime")
    val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    s.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val desc = Option(j.properties.getProperty("spark.job.description")).getOrElse("")
        jobStart.put(j.jobId, (System.nanoTime(), desc.take(60)))
      }
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        Option(jobStart.remove(j.jobId)).foreach { case (t0, desc) =>
          println(f"[jtime]   job ${j.jobId}%3d ${(System.nanoTime() - t0) / 1e9}%7.3f s  $desc")
        }
      }
    })
    val qs = graft.SparkEntry.queries
    ids.foreach { id =>
      val fn = qs.getOrElse(id, sys.error(s"unknown query id: $id"))
      (1 to runs).foreach { r =>
        System.gc()
        println(s"[jtime] ===== $id run $r =====")
        val t0 = System.nanoTime()
        try fn(s, dir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable => System.err.println(s"[jtime] $id: $e") }
        println(f"[jtime] $id total ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }
    s.stop()
  }
}
