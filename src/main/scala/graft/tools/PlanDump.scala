package graft.tools

/** Dev utility: print the extended plan of one or more query ids.
  *
  * Usage: sbt "runMain graft.tools.PlanDump <sfDir> <id1,id2,...>"
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val Array(dir, idsCsv) = args.take(2)
    val spark = graft.Engine.session("graft-plandump")
    idsCsv.split(",").foreach { id =>
      val df = graft.SparkEntry.queries(id)(spark, dir)
      println(s"===== $id =====")
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExtendedMode))
    }
    spark.stop()
  }
}
