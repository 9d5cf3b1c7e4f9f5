package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkEntry

object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .appName("codegen-audit")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (q <- Seq("q1_agg", "apply_changes", "join_star", "sim_topk")) {
      val df = SparkEntry.queries(q)(spark, "/root/testdata/sf0.01")
      val cg = df.queryExecution.explainString(org.apache.spark.sql.execution.CodegenMode)
      println("[audit] " + q + " :: " + cg.linesIterator.find(_.contains("WholeStageCodegen")).getOrElse("NONE"))
    }
    spark.stop()
  }
}
