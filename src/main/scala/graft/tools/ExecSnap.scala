package graft.tools

import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Dev utility: execute query ids (noop sink) and write the FINAL
  * adaptive plan — the post-execution plan with AQE's runtime decisions
  * (ReusedExchange / AQEShuffleRead / join rewrites) that the initial
  * `explain` cannot show (guide §7.2: "the SQL tab shows the final
  * re-optimised plan after the query has run"). The plan is taken from a
  * QueryExecutionListener so it is the WRITE command's own execution
  * (calling `df.queryExecution` after a write would print a separate,
  * never-executed AdaptiveSparkPlan with no stage reuse applied).
  *
  * Usage: sbt "runMain graft.tools.ExecSnap <sfDir> <outDir> <tag> <id1,...>"
  */
object ExecSnap {
  def main(args: Array[String]): Unit = {
    val Array(dir, outDir, tag, idsCsv) = args.take(4)
    val spark = graft.Engine.session("graft-execsnap")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    @volatile var last: QueryExecution = null
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
        last = qe
      override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    idsCsv.split(",").foreach { id =>
      val df = graft.SparkEntry.queries(id)(spark, dir)
      last = null
      df.write.format("noop").mode("overwrite").save()
      // listener callbacks are asynchronous — wait for the write's QE
      var waited = 0
      while (last == null && waited < 10000) { Thread.sleep(50); waited += 50 }
      val plan = if (last != null) last.executedPlan.toString else "<listener timeout>"
      java.nio.file.Files.write(
        java.nio.file.Paths.get(outDir, s"${id}_$tag.txt"),
        plan.getBytes("UTF-8"))
      val reused = "ReusedExchange".r.findAllIn(plan).size
      val scans = "Scan parquet".r.findAllIn(plan).size
      println(s"[execsnap] $id: ReusedExchange=$reused scans=$scans -> $outDir/${id}_$tag.txt")
    }
    spark.stop()
  }
}
