package graft.tools

/** Dev probe: run a query id to completion and print its EXECUTED
  * adaptive plan (post-AQE — shows runtime exchange/stage reuse the
  * static dump cannot).
  *
  * Usage: sbt "runMain graft.tools.ExecPlan <sfDir> <id1,id2,...>"
  */
object ExecPlan {
  def main(args: Array[String]): Unit = {
    val Array(dir, idsCsv) = args.take(2)
    val s = graft.Engine.session("graft-execplan")
    idsCsv.split(",").foreach { id =>
      val df = graft.SparkEntry.queries(id)(s, dir)
      // drive THIS df's own execution (collect on the same QueryExecution)
      // so the printed adaptive plan is the final, post-reuse one — a
      // noop write would execute a fresh copy and leave this one initial
      df.queryExecution.executedPlan.executeCollect()
      println(s"===== $id (executed) =====")
      println(df.queryExecution.executedPlan.toString)
    }
    s.stop()
  }
}
