package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._
import graft.Tables

/** JSON-lines source (SURVEY.md §2.1). JSON is the reference's native
  * wire text: OLR emits change records as JSON
  * (`scripts/OpenLogReplicator.json:30` `"format":{"type":"json"}`) and
  * the Debezium envelope itself is JSON — the engine parses those
  * through `Ops.envelopeParse`; this source covers the OTHER JSON role,
  * a jsonl FILE dataset read as a typed table (the interchange format
  * most raw text-corpus drops arrive in). `spark.read.schema(...).json`
  * — explicit schema, never inference: at 100 TB schema inference is a
  * full extra pass over the data, and a drifting inferred type (int →
  * long on the first overflow) silently re-types downstream plans.
  *
  * `json_scan` proves the spool-out → jsonl-parse → typed-rows path is
  * lossless for supplier (bigint/string/int/double survive JSON
  * exactly — doubles round-trip via shortest-repr printing).
  */
object JsonSpool {

  val supplierSchema: StructType = StructType(Seq(
    StructField("s_suppkey", LongType),
    StructField("s_name", StringType),
    StructField("s_nationkey", IntegerType),
    StructField("s_acctbal", DoubleType)))

  /** Spool a table to a jsonl directory (idempotent overwrite). */
  def spool(df: DataFrame, path: String): String = {
    df.write.mode("overwrite").json(path)
    path
  }

  def readSpool(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(supplierSchema).json(path)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "json_scan" -> ((s, dir) => {
      // fresh per-invocation temp dir — same race/collision rationale
      // as CsvSpool.csv_scan
      val spoolDir = graft.TempDirs.scratch("graft_json_spool")
      spool(Tables(s, dir).supplier
        .select("s_suppkey", "s_name", "s_nationkey", "s_acctbal"),
        spoolDir.toString)
      readSpool(s, spoolDir.toString).orderBy("s_suppkey")
    })
  )

  def oracleSql: Map[String, String] = Map(
    "json_scan" ->
      "SELECT s_suppkey, s_name, s_nationkey, s_acctbal FROM supplier ORDER BY s_suppkey"
  )
}
