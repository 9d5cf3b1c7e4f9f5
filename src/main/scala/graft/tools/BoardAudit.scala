package graft.tools
// quick dev audit: every oracle id must have a query; report counts
object BoardAudit {
  def main(args: Array[String]): Unit = {
    val s = graft.Engine.session("graft-audit")
    val q = graft.SparkEntry.queries.keySet
    // run one bpe query so the dynamic oracles are live
    graft.SparkEntry.queries("bpe_encode")(s, "/root/testdata/sf0.001").count()
    graft.SparkEntry.queries("ann_ivf")(s, "/root/testdata/sf0.001").count()
    val o = graft.SparkEntry.oracleSql.keySet
    println(s"[audit] queries=${q.size} oracles=${o.size} orphans=${(o -- q).toList.sorted}")
    s.stop()
  }
}
