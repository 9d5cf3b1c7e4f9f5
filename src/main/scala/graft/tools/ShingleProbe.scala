package graft.tools

import org.apache.spark.sql.functions._

/** Dev: cost split of the near-dup build — shingles alone vs +banding. */
object ShingleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = graft.Engine.session("graft-shingle-probe")
    def time(tag: String)(f: => Unit): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        f
        println(f"[probe] $tag run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    val docs = graft.Tables(spark, sfDir).documents
    time("shingleArrays only") {
      graft.llm.NearDedup.shingleArrays(docs)
        .write.format("noop").mode("overwrite").save()
    }
    time("shingleArrays + banded") {
      graft.llm.NearDedup.banded(graft.llm.NearDedup.shingleArrays(docs))
        .drop("sh").write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
