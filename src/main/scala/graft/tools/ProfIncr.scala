package graft.tools

import org.apache.spark.sql.functions._
import graft.llm.NearDedup

/** Dev utility: wall-time the incremental-admission pipeline's coarse
  * stages against real fixture data.
  *
  * Usage: sbt "runMain graft.tools.ProfIncr [sfDir]"
  *
  * Only PUBLIC NearDedup surface is driven (banding, admitBatch, the
  * dedup_incremental query id) — deliberately no copy of admitBatch's
  * internal candidate pipeline, which would silently drift from the
  * production code and misattribute stage costs (it did once; the
  * fused-bucket persist landed in admitBatch while an earlier copy here
  * still measured the pre-fix shape). For stage-level attribution
  * inside admitBatch, read the Spark UI / event log of this run instead.
  */
object ProfIncr {
  def time[T](tag: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"[prof] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = graft.Engine.session("prof-incr")
    try {
      // warm the family caches (bootstrap state + shingles) the way the
      // bench's first run does, so the loop below measures steady state
      graft.SparkEntry.queries("dedup_incremental")(s, dir)
        .write.format("noop").mode("overwrite").save()
      val arrs = NearDedup.shingleArrays(graft.Tables(s, dir).documents)
      val batch = NearDedup.banded(arrs.filter(col("doc_id") % 2 =!= 0)).localCheckpoint()
      val corpus = NearDedup.banded(arrs.filter(col("doc_id") % 2 === 0)).localCheckpoint()
      val state0 = NearDedup.admitBatch(corpus, corpus.limit(0))
      for (_ <- 1 to 3) {
        time("band(batch)") {
          NearDedup.banded(arrs.filter(col("doc_id") % 2 =!= 0))
            .write.format("noop").mode("overwrite").save()
        }
        time("admitBatch (pre-banded)") { NearDedup.admitBatch(batch, state0) }
        time("full query id") {
          graft.SparkEntry.queries("dedup_incremental")(s, dir)
            .write.format("noop").mode("overwrite").save()
        }
      }
    } finally s.stop()
  }
}
