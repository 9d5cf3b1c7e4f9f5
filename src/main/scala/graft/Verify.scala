package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    require(args.length == 2 || args.length == 3,
      s"usage: graft.Verify <sfDir> <outDir> [onlyIdsCsv] (got ${args.length} args)")
    val Array(sfDir, outDir) = args.take(2)
    // dev-only narrowing for local parity iteration; the driver always
    // calls with 2 args and gets the full dump
    val only: Option[Set[String]] =
      if (args.length == 3) Some(args(2).split(",").toSet) else None
    // ONE session builder for all mains (this file had kept a stale
    // private copy with cpus=16 while Engine/Bench documented 32 as the
    // baseline config — three diverging builders is how that happens)
    val spark = Engine.session("graft-verify")
    // Pin the fixture dir for dynamic (model-embedding) oracles up
    // front — memo cache hits perform no table() read, so inference
    // from read side effects is not reliable here (round-18 ADVICE).
    Engine.setDumpDir(sfDir)
    new java.io.File(outDir).mkdirs()
    // Normalize any stray TIMESTAMP (LTZ) column to TIMESTAMP_NTZ so the
    // dumped parquet carries naive-UTC timestamps, matching how DuckDB
    // types the oracle side (session TZ is pinned UTC, values identical).
    def ntz(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
      df.select(df.schema.fields.map { f =>
        if (f.dataType == org.apache.spark.sql.types.TimestampType)
          org.apache.spark.sql.functions.col(f.name)
            .cast(org.apache.spark.sql.types.TimestampNTZType).as(f.name)
        else org.apache.spark.sql.functions.col(f.name)
      }.toSeq: _*)
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try ntz(fn(spark, sfDir)).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
