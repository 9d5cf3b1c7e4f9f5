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

  test("hash-sensitive queries are run-to-run deterministic") {
    // the driver's correctness check hashes sorted values, so ANY
    // nondeterminism (rand(), partition-order ties, unsorted collects)
    // flips a green id red intermittently. Exercise the ids whose
    // construction is most at risk — hashing/sampling/windows/
    // iterative — twice and demand identical rows.
    val s = SparkSpec.session
    val risky = Seq("sample_hash", "split_train_test", "stratified_sample",
      "seq_pack", "corpus_mix", "dedup_near", "dedup_cluster", "dedup_simhash",
      "agg_collect", "win_rownum", "agg_maxby", "txn_group", "sim_topk")
    for (q <- risky) {
      val fn = SparkEntry.queries(q)
      val a = fn(s, "/root/testdata/sf0.001").collect().map(_.toString).toSeq
      val b = fn(s, "/root/testdata/sf0.001").collect().map(_.toString).toSeq
      assert(a == b, s"$q returned different rows across two identical runs")
    }
  }

  test("query ids are unique across modules (no silent map overwrites)") {
    val all = Seq(
      cdc.CdcQueries.queries, rel.Queries.queries, llm.TextOps.queries,
      llm.Curation.queries, llm.Sampling.queries, llm.NearDedup.queries,
      llm.VectorOps.queries, llm.Multimodal.queries, llm.Bpe.queries,
      llm.WordPiece.queries, llm.Unigram.queries,
      llm.TokenizerCompare.queries, llm.QualityModel.queries,
      sources.AvroCodec.queries,
      sources.JdbcSource.queries, sources.CsvSpool.queries,
      sources.JsonSpool.queries, sources.OrcSource.queries,
      sources.ZOrder.queries)
    val ids = all.flatMap(_.keys)
    val dupes = ids.groupBy(identity).filter(_._2.size > 1).keys
    assert(dupes.isEmpty, s"duplicate query ids: $dupes")
    assert(ids.size == SparkEntry.queries.size)
  }
}
