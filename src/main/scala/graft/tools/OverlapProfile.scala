package graft.tools

import org.apache.spark.sql.functions._
import graft.llm.NearDedup

/** Dev utility: stage-level timing for `source_overlap` — is the
  * collect_set aggregate or the in-task pair emission the cost driver?
  *
  * Usage: sbt "runMain graft.tools.OverlapProfile <sfDir> [runs]"
  */
object OverlapProfile {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val runs = if (args.length > 1) args(1).toInt else 3
    val s = graft.Engine.session("graft-overlap-profile")
    try {
      val docs = graft.Tables(s, dir).documents
      def time(label: String)(body: => Long): Unit = {
        val ts = (1 to runs).map { _ =>
          System.gc()
          val t0 = System.nanoTime()
          val n = body
          val dt = (System.nanoTime() - t0) / 1e9
          (dt, n)
        }
        val med = ts.map(_._1).sorted.apply(runs / 2)
        println(f"[oprof] $label%-28s median=$med%.3f s  rows=${ts.head._2}  runs=${ts.map(t => f"${t._1}%.3f").mkString(",")}")
      }
      // warm a persisted shingle table outside the timers, standing in
      // for the memoized per-corpus table the real query reads
      val shingles = NearDedup.shingleArrays(docs).persist()
      shingles.count()
      val withSource = shingles
        .join(docs.select("doc_id", "source"), "doc_id")
        .select(col("source"), explode(col("sh")).as("ng"))
      time("explode-only (scan+join)") { withSource.count() }
      val perNg = withSource
        .groupBy("ng").agg(sort_array(collect_set(col("source"))).as("ss"))
        .filter(size(col("ss")) >= 2)
      time("collect_set agg (>=2 set)") { perNg.count() }
      val pairs = perNg
        .select(posexplode(col("ss")).as(Seq("i", "s1")), col("ss"))
        .select(col("s1"),
          explode(slice(col("ss"), col("i") + 2, size(col("ss")))).as("s2"))
        .groupBy("s1", "s2")
        .agg(count(lit(1)).as("n_shared"))
      time("full (agg+pairs+count)") { pairs.count() }
      // candidate variant: 64-bit shingle hash as the shuffle key
      val perH = withSource
        .select(col("source"), xxhash64(col("ng")).as("h"))
        .groupBy("h").agg(sort_array(collect_set(col("source"))).as("ss"))
        .filter(size(col("ss")) >= 2)
      time("hash-key agg (>=2 set)") { perH.count() }
      val pairsH = perH
        .select(posexplode(col("ss")).as(Seq("i", "s1")), col("ss"))
        .select(col("s1"),
          explode(slice(col("ss"), col("i") + 2, size(col("ss")))).as("s2"))
        .groupBy("s1", "s2")
        .agg(count(lit(1)).as("n_shared"))
      time("full hash-key variant") { pairsH.count() }
    } finally s.stop()
  }
}
