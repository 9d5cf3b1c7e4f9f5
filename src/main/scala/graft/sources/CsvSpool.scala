package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._
import graft.Tables

/** CSV / spool-directory source (SURVEY.md §2.1: the reference installs
  * the kafka-connect-spooldir plugin, `Dockerfile:65-66`). In-engine the
  * equivalent is `spark.read.csv` (batch) / `spark.readStream.csv`
  * (directory tailing); the `csv_scan` query proves the full
  * spool-out → csv-parse → typed-rows path is lossless for the nation
  * table (int/string columns survive CSV exactly).
  */
object CsvSpool {

  val nationSchema: StructType = StructType(Seq(
    StructField("n_nationkey", IntegerType),
    StructField("n_name", StringType),
    StructField("n_regionkey", IntegerType)))

  /** Spool a table to a CSV directory (idempotent overwrite). */
  def spool(df: DataFrame, path: String): String = {
    df.write.mode("overwrite").option("header", "true").csv(path)
    path
  }

  def readSpool(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(nationSchema).option("header", "true").csv(path)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "csv_scan" -> ((s, dir) => {
      // a fresh per-invocation temp dir (shutdown-hook cleaned), not a path
      // derived from `dir`: the old lossy sanitization could collide two
      // distinct dataset dirs onto one spool path, and two concurrent
      // processes racing the same overwrite-then-read directory could
      // each read the other's half-written spool
      val spoolDir = graft.TempDirs.scratch("graft_csv_spool")
      spool(Tables(s, dir).nation.select("n_nationkey", "n_name", "n_regionkey"),
        spoolDir.toString)
      readSpool(s, spoolDir.toString).orderBy("n_nationkey")
    })
  )

  def oracleSql: Map[String, String] = Map(
    "csv_scan" ->
      "SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey"
  )
}
