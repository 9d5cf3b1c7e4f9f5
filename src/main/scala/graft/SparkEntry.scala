package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates the per-family query maps; every query id present in
  * `oracleSql` is hash-checked against DuckDB by the driver, the rest get
  * a rows-only check.
  */
object SparkEntry {

  /** Flagship query (SURVEY.md §7.2): the reference's full §3.1 + §3.3
    * path — change feed → envelope → unwrap → apply_changes → current
    * state — on sf0.001; driver smoke-checks rows>0.
    */
  def entry(spark: SparkSession): DataFrame =
    cdc.CdcQueries.queries("apply_changes")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    cdc.CdcQueries.queries ++
      rel.Queries.queries ++
      llm.TextOps.queries ++
      llm.Curation.queries ++
      llm.Sampling.queries ++
      llm.NearDedup.queries ++
      llm.VectorOps.queries ++
      llm.Multimodal.queries ++
      sources.AvroCodec.queries ++
      sources.JdbcSource.queries ++
      sources.CsvSpool.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    cdc.CdcQueries.oracleSql ++
      rel.Queries.oracleSql ++
      llm.TextOps.oracleSql ++
      llm.Curation.oracleSql ++
      llm.Sampling.oracleSql ++
      llm.NearDedup.oracleSql ++
      llm.VectorOps.oracleSql ++
      llm.Multimodal.oracleSql ++
      sources.AvroCodec.oracleSql ++
      sources.JdbcSource.oracleSql ++
      sources.CsvSpool.oracleSql
}
