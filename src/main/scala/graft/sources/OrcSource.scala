package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Tables

/** ORC source/sink (SURVEY.md §2.1 family: alongside CSV/JDBC/Avro —
  * the other columnar format a Spark-native engine must read, and the
  * common interchange format when the upstream warehouse is Hive/Trino).
  * Spark's vectorized ORC reader gives the same pushdown/pruning
  * contract as parquet, so the engine's scan-side guarantees carry over
  * unchanged; `orc_scan` proves the full write→read roundtrip is
  * lossless for long/string/timestamp/double columns (the orders
  * table), hash-checked against the parquet originals in DuckDB.
  */
object OrcSource {

  /** Write a table to an ORC directory (idempotent overwrite). */
  def write(df: DataFrame, path: String): String = {
    df.write.mode("overwrite").orc(path)
    path
  }

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "orc_scan" -> ((s, dir) => {
      // fresh per-invocation temp dir, same race/collision rationale as
      // CsvSpool.csv_scan
      val orcDir = graft.TempDirs.scratch("graft_orc")
      write(Tables(s, dir).orders
        .select("o_orderkey", "o_orderstatus", "o_orderdate", "o_totalprice"),
        orcDir.toString)
      read(s, orcDir.toString).orderBy("o_orderkey")
    })
  )

  def oracleSql: Map[String, String] = Map(
    "orc_scan" ->
      """SELECT o_orderkey, o_orderstatus, o_orderdate, o_totalprice
        |FROM orders ORDER BY o_orderkey""".stripMargin
  )
}
