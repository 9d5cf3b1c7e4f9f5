package graft.tools

import org.apache.spark.sql.functions._
import graft.llm.NearDedup

object ProfIncr {
  def time[T](tag: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"[prof] $tag%-28s ${(System.nanoTime()-t0)/1e9}%.3f s"); r
  }
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val s = graft.Engine.session("prof-incr")
    try {
      // warm family caches (bootstrap state + shingles) like the bench's first run
      graft.SparkEntry.queries("dedup_incremental")(s, dir).write.format("noop").mode("overwrite").save()
      val arrs = NearDedup.shingleArrays(graft.Tables(s, dir).documents)
      val batch = NearDedup.banded(arrs.filter(col("doc_id") % 2 =!= 0)).localCheckpoint()
      val corpus = NearDedup.banded(arrs.filter(col("doc_id") % 2 === 0)).localCheckpoint()
      val state0 = NearDedup.admitBatch(corpus, corpus.limit(0))
      val bandCols = batch.columns.filter(_.startsWith("band_")).map(col)
      def buckets(df: org.apache.spark.sql.DataFrame) = df.select(
        col("doc_id"), posexplode(array(bandCols.toIndexedSeq: _*)).as(Seq("band", "band_sig")))
      for (i <- 1 to 3) {
        val bucketed = buckets(batch).withColumn("is_new", lit(true))
          .unionByName(buckets(state0).withColumn("is_new", lit(false)))
          .groupBy("band", "band_sig")
          .agg(sort_array(collect_list(when(col("is_new"), col("doc_id")))).as("ns"),
               sort_array(collect_list(when(!col("is_new"), col("doc_id")))).as("os"))
        time("bucket agg count") { bucketed.count() }
        val newNew = bucketed.filter(size(col("ns")).between(2, 10000))
          .select(posexplode(col("ns")).as(Seq("i", "doc1")), col("ns"))
          .select(col("doc1"), explode(slice(col("ns"), col("i") + 2, size(col("ns")))).as("doc2"))
        val newOld = bucketed.filter(size(col("ns")) >= 1 && size(col("os")).between(1, 10000))
          .select(explode(col("ns")).as("doc1"), col("os"))
          .select(col("doc1"), explode(col("os")).as("doc2"))
        val cand = time("cand distinct count") { val c = newNew.unionByName(newOld).distinct().persist(); val n = c.count(); println("[prof]   n_cand=" + n); c }
        val arrs2 = batch.select("doc_id", "sh").unionByName(state0.select("doc_id", "sh"))
        val dup = time("jaccard verify") { val d = NearDedup.jaccard(cand, arrs2).filter(col("jacc") >= 0.5).select("doc1","doc2").persist(); println("[prof]   n_dup=" + d.count()); d }
        time("full admitBatch") { NearDedup.admitBatch(batch, state0) }
        cand.unpersist(); dup.unpersist()
      }
    } finally s.stop()
  }
}
