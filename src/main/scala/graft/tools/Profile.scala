package graft.tools

import graft.{Engine, SparkEntry}

/** Dev profiler: run one query N times against a scale dir, print times
  * and optionally the formatted plan. Usage:
  *   runMain graft.tools.Profile <query> [sfDir] [n] [explain]
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val n = if (args.length > 2) args(2).toInt else 3
    val doExplain = args.contains("explain")
    val spark = Engine.session("graft-profile")
    val fn = SparkEntry.queries(name)
    if (doExplain) fn(spark, sfDir).explain("formatted")
    (1 to n).foreach { i =>
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(f"[profile] $name run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
