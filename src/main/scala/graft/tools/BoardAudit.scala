package graft.tools
// quick dev audit: every oracle id must have a query; report counts
object BoardAudit {
  def main(args: Array[String]): Unit = {
    // fixture dir from argv so the probe works on any layout
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val s = graft.Engine.session("graft-audit")
    val q = graft.SparkEntry.queries.keySet
    // run the model-training queries so the dynamic oracles are live
    graft.SparkEntry.queries("bpe_encode")(s, dir).count()
    graft.SparkEntry.queries("ann_ivf")(s, dir).count()
    graft.SparkEntry.queries("quality_model_score")(s, dir).count()
    graft.SparkEntry.queries("perplexity_buckets_approx")(s, dir).count()
    graft.SparkEntry.queries("dsir_select_approx")(s, dir).count()
    val o = graft.SparkEntry.oracleSql.keySet
    println(s"[audit] queries=${q.size} oracles=${o.size} orphans=${(o -- q).toList.sorted}")
    s.stop()
  }
}
