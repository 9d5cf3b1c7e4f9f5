package graft.tools

import org.apache.spark.sql.functions._
import graft.llm.NearDedup

/** Dev utility: stage-level timing of the dedup_incremental admission
  * path (banding the batch, candidate generation, the full admission,
  * the query tail) to locate the per-batch fixed cost. Throwaway
  * diagnosis harness, same spirit as [[SimhashAB]]. Round-7 findings it
  * produced: CC job overhead (2.3 s on a 185-edge graph) → the driver
  * union-find fast-path; three parallel bucket pipelines → the fused
  * batch+state bucket aggregation in admitBatch.
  */
object AdmitProfile {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = graft.Engine.session("graft-admit-profile")
    def time[T](label: String)(f: => T): T = {
      System.gc()
      val t0 = System.nanoTime()
      val r = f
      println(f"[admit] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val docs = graft.Tables(spark, dir).documents
    val arrs = NearDedup.shingleArrays(docs).persist()
    arrs.count()
    val state0 = time("bootstrap state (even ids)") {
      val corpus = NearDedup.banded(arrs.filter(col("doc_id") % 2 === 0))
      NearDedup.admitBatch(corpus, corpus.limit(0))
    }
    for (round <- 1 to 2) {
      println(s"--- round $round")
      val batch = time("band the odd batch") {
        val b = NearDedup.banded(arrs.filter(col("doc_id") % 2 =!= 0)).persist()
        b.count(); b
      }
      time("candidates(batch) count") {
        NearDedup.candidates(batch).count()
      }
      time("full admitBatch") {
        NearDedup.admitBatch(batch, state0)
      }
      time("admit + doc join (query tail)") {
        NearDedup.admitBatch(batch, state0)
          .select(col("doc_id"))
          .join(docs, "doc_id")
          .select(col("doc_id"), md5(col("text")).as("h"))
          .orderBy("doc_id")
          .write.format("noop").mode("overwrite").save()
      }
      batch.unpersist()
    }
    spark.stop()
  }
}
