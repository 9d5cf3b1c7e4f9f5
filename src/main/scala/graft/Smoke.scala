package graft

/** Dev smoke runner: exercises the driver's `entry` contract exactly as
  * the harness does (flagship CDC slice on sf0.001, expects rows > 0).
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session("graft-smoke")
    val df = SparkEntry.entry(spark)
    val n = df.count()
    df.show(5, truncate = false)
    println(s"[smoke] entry rows=$n (driver requires > 0)")
    assert(n > 0, "entry returned no rows")
    spark.stop()
  }
}
