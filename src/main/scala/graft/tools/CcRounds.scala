package graft.tools

import graft.{Engine, SparkEntry}

/** Dev: run dedup_cluster and print the CC round count + edge count. */
object CcRounds {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = Engine.session("graft-cc-rounds")
    val t0 = System.nanoTime()
    val n = SparkEntry.queries("dedup_cluster")(spark, sfDir).count()
    println(f"[cc] rows=$n rounds=${graft.llm.NearDedup.lastCcRounds.get()} elapsed=${(System.nanoTime()-t0)/1e9}%.2f s")
    spark.stop()
  }
}
