package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Exact substring dedup (Lee et al. 2021) — the span-ownership rule
  * over k-gram hashes. The headline test is the operator's reason to
  * exist: a 50-token verbatim copy embedded in an otherwise-different
  * long document is CAUGHT here while doc-level MinHash-Jaccard at the
  * family's 0.5 threshold misses it (the span is a sliver of the
  * shingle set).
  */
class SubstringDedupSpec extends SparkSpec {
  import spark.implicits._

  private def words(prefix: String, n: Int): Seq[String] =
    (0 until n).map(i => s"$prefix$i")

  test("planted 50-token copy: caught by substring dedup, missed by 8-gram Jaccard") {
    // doc 1: 200 unique tokens containing a 50-token span at offset 100;
    // doc 2: 300 DIFFERENT tokens except the same 50-token span at offset 40.
    val span = words("shared", 50)
    val d1 = words("alpha", 100) ++ span ++ words("beta", 50)
    val d2 = words("gamma", 40) ++ span ++ words("delta", 210)
    val docs = Seq((1L, d1.mkString(" ")), (2L, d2.mkString(" ")))
      .toDF("doc_id", "text")

    // substring dedup drops doc 2 (shares a >=20-token span with doc 1)
    val kept = NearDedup.dedupSubstring(docs, k = 20)
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(1L))

    // the family's doc-level near-dup pipeline does NOT pair them:
    // shared 3-shingles = 48 of (198 + 298) distinct shingles → Jaccard
    // ≈ 0.107, far under the 0.5 verify threshold — and the operator's
    // full pair output is empty.
    val arrs = NearDedup.shingleArrays(docs)
    val pairs = NearDedup.jaccard(
      NearDedup.candidates(NearDedup.banded(arrs)), arrs)
      .filter(col("jacc") >= 0.5)
    assert(pairs.count() == 0L)
    // but the pair they WOULD form scores well under threshold even if
    // banding had colliding them — the miss is semantic, not luck: the
    // exact Jaccard of the two shingle sets is < 0.15
    val j = NearDedup.jaccard(
      Seq((1L, 2L)).toDF("doc1", "doc2"), arrs)
      .select("jacc").as[Double].head()
    assert(j < 0.15, s"planted overlap should be a sliver of the set, got $j")
  }

  test("earlier-doc rule: ownership is by minimum doc_id, chains drop all later sharers") {
    // three docs all containing the same 20-token span: only the
    // smallest id survives (2 and 3 each share with EARLIER doc 1,
    // regardless of 2's own removal — the Lee et al. doc-level rule is
    // parallel, not sequential admission)
    val span = words("s", 20)
    val docs = Seq(
      (1L, (words("a", 30) ++ span).mkString(" ")),
      (2L, (span ++ words("b", 30)).mkString(" ")),
      (3L, (words("c", 15) ++ span ++ words("d", 15)).mkString(" "))
    ).toDF("doc_id", "text")
    val kept = NearDedup.dedupSubstring(docs, k = 20)
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(1L))
  }

  test("no shared span of length k: everything survives (k-1 overlap is not enough)") {
    // docs share only a 19-token run; with k=20 no window matches
    val span = words("x", 19)
    val docs = Seq(
      (1L, (words("p", 40) ++ span).mkString(" ")),
      (2L, (span ++ words("q", 40)).mkString(" "))
    ).toDF("doc_id", "text")
    val kept = NearDedup.dedupSubstring(docs, k = 20)
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(1L, 2L))
  }

  test("short docs (< k tokens) never participate, even if identical") {
    val docs = Seq(
      (1L, words("t", 10).mkString(" ")),
      (2L, words("t", 10).mkString(" "))
    ).toDF("doc_id", "text")
    val kept = NearDedup.dedupSubstring(docs, k = 20)
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(1L, 2L))
  }

  test("gram generation: sliding windows, distinct within doc, exact count") {
    // 25 tokens, k=20 → 6 windows, all distinct
    val docs = Seq((7L, words("w", 25).mkString(" "))).toDF("doc_id", "text")
    val grams = NearDedup.substringGrams(docs, k = 20)
    assert(grams.count() == 6L)
    // a doc of one repeated token: all windows identical → ONE gram
    // (array_distinct caps per-doc emission at distinct windows)
    val rep = Seq((8L, Seq.fill(30)("same").mkString(" "))).toDF("doc_id", "text")
    assert(NearDedup.substringGrams(rep, k = 20).count() == 1L)
  }

  test("spans: a planted 50-token copy is recovered with exact boundaries") {
    val span = words("shared", 50)
    val d1 = words("alpha", 100) ++ span ++ words("beta", 50)   // span at tokens 101..150
    val d2 = words("gamma", 40) ++ span ++ words("delta", 210)  // span at tokens 41..90
    val docs = Seq((1L, d1.mkString(" ")), (2L, d2.mkString(" ")))
      .toDF("doc_id", "text")
    val spans = NearDedup.substringSpans(docs, k = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // doc 1 owns every gram (smaller id) — no spans; doc 2's flagged
    // windows are exactly those inside the copy, merging to [41, 90]
    assert(spans.toSeq == Seq((2L, 41L, 90L)), spans.mkString(","))
  }

  test("spans: two separated copies yield two spans; a full-doc clone yields one full span") {
    val s1 = words("one", 25)
    val s2 = words("two", 25)
    val owner = (s1 ++ words("mid", 30) ++ s2).mkString(" ")
    val copier = (words("x", 10) ++ s1 ++ words("y", 40) ++ s2 ++ words("z", 10)).mkString(" ")
    val docs = Seq((1L, owner), (2L, copier), (3L, owner))
      .toDF("doc_id", "text")
    val spans = NearDedup.substringSpans(docs, k = 20)
      .orderBy("doc_id", "span_start")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // doc 2: s1 at 11..35, s2 at 76..100; doc 3: the whole 80 tokens
    assert(spans.toSeq == Seq((2L, 11L, 35L), (2L, 76L, 100L), (3L, 1L, 80L)),
      spans.mkString(","))
  }

  test("scrub: duplicated ranges removed, owner and clean text untouched, full clones vanish") {
    val span = words("shared", 50)
    val d1 = words("alpha", 100) ++ span ++ words("beta", 50)
    val d2 = words("gamma", 40) ++ span ++ words("delta", 210)
    val docs = Seq(
      (1L, d1.mkString(" ")),
      (2L, d2.mkString(" ")),
      (3L, d1.mkString(" ")) // full clone of doc 1 → scrubbed to nothing
    ).toDF("doc_id", "text")
    val got = NearDedup.substringScrub(docs, k = 20)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // owner keeps everything; doc 2 loses exactly the copied 50 tokens;
    // doc 3 (wholly duplicated) drops out of the result
    assert(got.keySet == Set(1L, 2L))
    assert(got(1L) == d1.mkString(" "))
    assert(got(2L) == (words("gamma", 40) ++ words("delta", 210)).mkString(" "))
  }

  test("fixture run is non-vacuous and matches the independent min-owner replay") {
    val docs = graft.Tables(spark, sf("sf0.001")).documents
    val kept = NearDedup.dedupSubstring(docs, k = 20)
      .select("doc_id").as[Long].collect().toSet
    val total = docs.count()
    assert(kept.size < total, "expected at least one dropped doc in the fixture")
    // independent replay in local Scala: same tokenization, same rule
    val local = docs.select("doc_id", "text").as[(Long, String)].collect()
    val owner = scala.collection.mutable.HashMap.empty[String, Long]
    local.sortBy(_._1).foreach { case (id, text) =>
      val ws = text.split(" ", -1)
      if (ws.length >= 20)
        ws.sliding(20).map(_.mkString(" ")).foreach { w =>
          if (!owner.contains(w) || owner(w) > id) owner(w) = id
        }
    }
    val expectDropped = local.flatMap { case (id, text) =>
      val ws = text.split(" ", -1)
      val hit = ws.length >= 20 &&
        ws.sliding(20).map(_.mkString(" ")).exists(w => owner(w) < id)
      if (hit) Some(id) else None
    }.toSet
    assert(kept == local.map(_._1).toSet -- expectDropped)
  }
}
