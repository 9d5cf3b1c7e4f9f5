package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Simulates the DRIVER's side of the contract: a session built without
  * any of the engine's conf (no nanosAsLong, default shuffle partitions)
  * must still run entry() and a sample of queries.
  */
class DriverContractSpec extends AnyFunSuite {

  test("entry and queries run on a vanilla driver-built session") {
    // reuse the shared JVM session's context but CLEAR the session conf
    // the engine relies on, as a driver-built session would lack it
    val s = SparkSpec.session.newSession()
    s.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    assert(SparkEntry.entry(s).count() > 0)
    for (q <- Seq("cdc_scan", "q1_agg", "dedup_near", "stream_tumble")) {
      assert(SparkEntry.queries(q)(s, "/root/testdata/sf0.001").count() >= 0)
    }
  }

  test("every oracleSql key has a corresponding query") {
    val missing = SparkEntry.oracleSql.keySet.diff(SparkEntry.queries.keySet)
    assert(missing.isEmpty, s"oracleSql without queries: $missing")
  }

  test("query ids are unique across modules (no silent map overwrites)") {
    val all = Seq(
      cdc.CdcQueries.queries, rel.Queries.queries, llm.TextOps.queries,
      llm.Curation.queries, llm.Sampling.queries, llm.NearDedup.queries,
      llm.VectorOps.queries, llm.Multimodal.queries, sources.AvroCodec.queries,
      sources.JdbcSource.queries, sources.CsvSpool.queries)
    val ids = all.flatMap(_.keys)
    val dupes = ids.groupBy(identity).filter(_._2.size > 1).keys
    assert(dupes.isEmpty, s"duplicate query ids: $dupes")
    assert(ids.size == SparkEntry.queries.size)
  }
}
