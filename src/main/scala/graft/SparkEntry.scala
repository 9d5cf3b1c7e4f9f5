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

  /** Merge family maps, failing LOUDLY on a duplicate id: `++` alone
    * would let a later family silently shadow an earlier one's query —
    * the shadowed operator would simply stop being run or verified.
    */
  private def merged[V](parts: Seq[Map[String, V]], what: String): Map[String, V] = {
    val all = parts.reduce(_ ++ _)
    require(all.size == parts.map(_.size).sum, {
      val dupes = parts.flatMap(_.keys).groupBy(identity).filter(_._2.size > 1).keys
      s"duplicate $what ids across family maps: ${dupes.mkString(", ")}"
    })
    all
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    merged(Seq(
      cdc.CdcQueries.queries,
      rel.Queries.queries,
      llm.TextOps.queries,
      llm.Curation.queries,
      llm.Sampling.queries,
      llm.NearDedup.queries,
      llm.VectorOps.queries,
      llm.Multimodal.queries,
      llm.Bpe.queries,
      llm.WordPiece.queries,
      llm.Unigram.queries,
      llm.TokenizerCompare.queries,
      llm.QualityModel.queries,
      sources.AvroCodec.queries,
      sources.JdbcSource.queries,
      sources.CsvSpool.queries,
      sources.JsonSpool.queries,
      sources.OrcSource.queries,
      sources.ZOrder.queries), "query")

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    merged(Seq(
      cdc.CdcQueries.oracleSql,
      rel.Queries.oracleSql,
      llm.TextOps.oracleSql,
      llm.Curation.oracleSql,
      llm.Sampling.oracleSql,
      llm.NearDedup.oracleSql,
      llm.VectorOps.oracleSql,
      llm.Multimodal.oracleSql,
      // NOTE: Bpe's map is non-empty only after this JVM trained the
      // tokenizer (Verify runs queries before dumping oracle_sql.json,
      // so the full/driver flow always has it; a subset Verify without
      // a bpe id degrades those four ids to rows-only for that dump)
      llm.Bpe.oracleSql,
      llm.WordPiece.oracleSql,
      llm.Unigram.oracleSql,
      llm.TokenizerCompare.oracleSql,
      llm.QualityModel.oracleSql,
      sources.AvroCodec.oracleSql,
      sources.JdbcSource.oracleSql,
      sources.CsvSpool.oracleSql,
      sources.JsonSpool.oracleSql,
      sources.OrcSource.oracleSql,
      sources.ZOrder.oracleSql), "oracle")
}
