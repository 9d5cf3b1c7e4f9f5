package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** LSH guarantees worth enforcing: documents with IDENTICAL shingle sets
  * have identical minhash signatures in every band, so every exact-dup
  * pair MUST surface as a candidate (recall 1.0 on exact dups), and the
  * Jaccard verifier must score them 1.0.
  */
class NearDedupSpec extends SparkSpec {

  test("exact duplicates always collide in every LSH band") {
    val s = spark
    import s.implicits._
    val base = graft.Tables(s, sf("sf0.001")).documents
      .select("doc_id", "text").limit(20)
    // clone each doc with doc_id + 10000
    val clones = base.select((col("doc_id") + 10000).as("doc_id"), col("text"))
    val docs = base.unionByName(clones)
    val arrs = NearDedup.shingleArrays(docs)
    val cand = NearDedup.candidates(NearDedup.banded(arrs))
    val pairs = cand.collect().map(r => (r.getAs[Long]("doc1"), r.getAs[Long]("doc2"))).toSet
    val expected = base.select("doc_id").as[Long].collect()
      .filter(id => arrsHasShingles(arrs, id)).map(id => (id, id + 10000)).toSet
    assert(expected.subsetOf(pairs), s"missing exact-dup pairs: ${expected.diff(pairs)}")
    // and the verifier scores them 1.0
    val scored = NearDedup.jaccard(cand, arrs)
      .filter(col("doc2") === col("doc1") + 10000)
      .select("jacc").as[Double].collect()
    assert(scored.nonEmpty && scored.forall(_ == 1.0))
  }

  private def arrsHasShingles(arrs: org.apache.spark.sql.DataFrame, id: Long): Boolean =
    arrs.filter(col("doc_id") === id).count() == 1
}
