package graft.tools

/** Dev probe (round 18): does this session's Spark silently wrap BIGINT
  * overflow or throw like DuckDB? Pins the engine-divergence class the
  * density_e9 contract (TextOps.qualityE6Rational) is about.
  */
object OverflowProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Engine.session("graft-overflow-probe")
    import org.apache.spark.sql.functions._
    println(s"[probe] spark.sql.ansi.enabled = ${spark.conf.get("spark.sql.ansi.enabled")}")
    try {
      val r = spark.range(1).select((lit(Long.MaxValue) * lit(2L)).as("x")).collect()(0).getLong(0)
      println(s"[probe] Long.MaxValue * 2 = $r (SILENT WRAP)")
    } catch {
      case e: Throwable => println(s"[probe] Long.MaxValue * 2 THREW: ${e.getClass.getSimpleName}: ${e.getMessage.take(120)}")
    }
    spark.stop()
  }
}
