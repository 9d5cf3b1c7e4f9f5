package graft.tools

import org.apache.spark.sql.functions._

/** Stage-split probe for `dedup_winnow`'s 25x slope adjudication
  * (round 14): times (a) the winnow-HOF fingerprint derivation alone,
  * (b) the h-keyed posting aggregate, (c) the full pair pipeline —
  * median-of-3 each — so the slope's residual can be NAMED (compute
  * vs shuffle vs pair emission) instead of guessed.
  */
object WinnowProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = graft.Engine.session("graft-winnowprobe")
    val docs = graft.Tables(spark, dir).documents
    def time(tag: String)(mk: => Long): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); val n = mk; val dt = (System.nanoTime() - t0) / 1e9
        (dt, n)
      }
      val med = ts.map(_._1).sorted.apply(1)
      println(f"[winnowprobe] $tag%-22s median=$med%.3f s rows=${ts.head._2} runs=${ts.map(t => f"${t._1}%.3f").mkString(",")}")
    }
    time("hof_fingerprints") {
      graft.llm.TextOps.winnowFingerprints(docs).count()
    }
    time("h_posting_agg") {
      graft.llm.TextOps.winnowFingerprints(docs)
        .groupBy("h").agg(sort_array(array_distinct(collect_list(col("doc_id")))).as("ds"))
        .count()
    }
    time("full_pairs") {
      graft.llm.TextOps.winnowPairs(docs).count()
    }
    spark.stop()
  }
}
