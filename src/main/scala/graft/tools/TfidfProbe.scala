package graft.tools

/** Round-17 probe: does AQE still dedupe tfidf_topk's double scan at
  * runtime? Executes the id at sf0.1 and prints the FINAL adaptive
  * plan's ReusedExchange/ReusedQueryStage occurrences.
  */
object TfidfProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.Engine.session("graft-tfidfprobe")
    val df = graft.SparkEntry.queries("tfidf_topk")(spark, dir)
    df.collect() // materialize so AQE finalizes
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExtendedMode)
    val reused = "ReusedExchange|ReusedQueryStage|ReusedSubquery".r
      .findAllIn(p).toList.groupBy(identity).view.mapValues(_.size).toMap
    println(s"[tfidf-probe] reuse nodes in final adaptive plan: $reused")
    println(s"[tfidf-probe] scans: ${"Scan parquet".r.findAllIn(p).size}")
    spark.stop()
  }
}
