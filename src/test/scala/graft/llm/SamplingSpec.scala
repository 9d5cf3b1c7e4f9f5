package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** DSIR importance resampling + deterministic corpus shuffle (the
  * round-14 Sampling additions). The oracle differential proves the
  * cross-engine arithmetic; these tests pin the SEMANTICS on planted
  * corpora: target-vocab docs must outscore off-target docs, the
  * select cut must be the exact top quartile, the approx cut must sit
  * within rank-boundary noise of it, and the shuffle must be a
  * permutation with contiguous shard blocks.
  */
class SamplingSpec extends SparkSpec {

  private def corpus = {
    val s0 = spark
    import s0.implicits._
    Seq(
      (0L, "alpha beta gamma alpha beta alpha", "en", "s0"),
      (1L, "alpha beta gamma delta epsilon", "en", "s0"),
      (2L, "alpha gamma beta delta", "en", "s1"),
      // target vocabulary but off-target lang: DSIR scores the TEXT —
      // membership in the target subset is not what is being graded
      (3L, "alpha beta gamma delta", "fr", "s1"),
      // vocabulary absent from the target subset
      (4L, "zeta eta theta iota kappa", "fr", "s1"),
      (5L, "zeta eta theta iota", "de", "s0"),
      (6L, "", "en", "s0")
    ).toDF("doc_id", "text", "lang", "source")
  }

  test("dsir_score: target-vocab text outscores off-target text, features count grams, empty docs absent") {
    val s0 = spark
    import s0.implicits._
    val scored = Sampling.dsirScore(corpus)
      .select("doc_id", "n_feats", "score")
      .as[(Long, Long, Double)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
    // empty text carries no grams → absent (the text_perplexity convention)
    assert(scored.keySet == Set(0L, 1L, 2L, 3L, 4L, 5L))
    // n_feats = unigrams + bigrams = len + (len − 1)
    assert(scored(1L)._1 == 5 + 4)
    assert(scored(3L)._1 == 4 + 3)
    // doc 3 shares the target subset's vocabulary; doc 4 shares none of
    // it — the importance weight must order them decisively
    assert(scored(3L)._2 > scored(4L)._2,
      s"target-vocab doc must outscore off-target doc: ${scored(3L)._2} vs ${scored(4L)._2}")
    // the importance weight is a RELATIVE quantity (the paper resamples
    // by it; absolute sign is dominated by the add-1 prior on a tiny
    // corpus): every target-vocab doc must outrank every off-target doc
    val targetVocab = Seq(0L, 1L, 2L, 3L).map(scored(_)._2)
    val offVocab = Seq(4L, 5L).map(scored(_)._2)
    assert(targetVocab.min > offVocab.max,
      s"vocab separation lost: target=$targetVocab off=$offVocab")
    // determinism: hash features + fixed smoothing, no rand() anywhere
    val again = Sampling.dsirScore(corpus)
      .select("doc_id", "n_feats", "score")
      .as[(Long, Long, Double)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
    assert(again == scored)
  }

  test("dsir_select: keeps exactly the top score-quartile, ties broken by doc_id") {
    val s0 = spark
    import s0.implicits._
    val scored = graft.SparkEntry.queries("dsir_score")(s0, sf("sf0.001"))
      .select("doc_id", "score").as[(Long, Double)].collect()
    val n = scored.length
    val expect = scored.sortBy { case (id, sc) => (-sc, id) }
      .take(Math.ceil(n / 4.0).toInt).map(_._1).toSet
    val got = graft.SparkEntry.queries("dsir_select")(s0, sf("sf0.001"))
      .select("doc_id").as[Long].collect().toSet
    // ntile(4) gives quartile 1 exactly ceil(n/4) members when n mod 4
    // ∈ {0..3} — i.e. always the first ceil(n/4) of the ranked order
    assert(got == expect, s"selected ${got.size} of $n; expected ${expect.size}")
  }

  test("dsir_select_approx: the sketch cut sits within rank-boundary noise of the exact quartile") {
    val s0 = spark
    import s0.implicits._
    val scored = graft.SparkEntry.queries("dsir_score")(s0, sf("sf0.001"))
      .select("doc_id", "score").as[(Long, Double)].collect()
    val ranked = scored.sortBy { case (id, sc) => (-sc, id) }.map(_._1)
    val rank = ranked.zipWithIndex.toMap // 0-based
    val k = Math.ceil(ranked.length / 4.0).toInt
    val slack = math.max(1, ranked.length / 20)
    val approx = graft.SparkEntry.queries("dsir_select_approx")(s0, sf("sf0.001"))
      .select("doc_id").as[Long].collect().toSet
    assert(approx.nonEmpty)
    // every approx-selected doc ranks no worse than K + slack; every
    // exact-selected doc the sketch dropped ranks no better than K − slack
    approx.foreach { id =>
      assert(rank(id) < k + slack, s"doc $id at rank ${rank(id)} beyond quartile+noise $k+$slack")
    }
    ranked.take(k).filterNot(approx).foreach { id =>
      assert(rank(id) >= k - slack, s"doc $id at rank ${rank(id)} dropped despite clearing quartile−noise")
    }
  }

  test("mix_epochs: exact integer recipe — requested splits the budget by weight, repeats = ceil, upsampling flagged") {
    val s = spark
    import s.implicits._
    val rows = graft.SparkEntry.queries("mix_epochs")(s, sf("sf0.001"))
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    val wsum = rows.map(_._3).sum
    rows.foreach { case (src, avail, w, req, e6, rep) =>
      assert(req == 50000L * w / wsum, s"$src requested")
      assert(e6 == (2 * req * 1000000L + avail) / (2 * avail), s"$src epochs_e6")
      assert(rep == (req + avail - 1) / avail, s"$src n_repeats")
      assert(rep >= 1L == (req >= 1L), s"$src repeats/requested consistency")
    }
    // the fixture must exercise BOTH regimes: some source upsampled
    // (epochs > 1) and some downsampled (epochs < 1) — else the id
    // proves nothing about the recipe decision
    assert(rows.exists(_._5 > 1000000L), "no upsampled source on the fixture")
    assert(rows.exists(r => r._5 < 1000000L && r._5 > 0L), "no downsampled source")
  }

  test("corpus_shuffle: global_pos is a permutation, shards are contiguous blocks, order is hash-deterministic") {
    val s0 = spark
    import s0.implicits._
    val rows = graft.SparkEntry.queries("corpus_shuffle")(s0, sf("sf0.001"))
      .select("doc_id", "shard", "pos_in_shard", "global_pos")
      .as[(Long, Long, Long, Long)].collect()
    val n = rows.length
    assert(rows.map(_._4).sorted.toSeq == (1L to n).toSeq,
      "global positions must be exactly 1..n")
    // each shard must own one contiguous global block, in shard order
    val byShard = rows.groupBy(_._2).toSeq.sortBy(_._1)
    var next = 1L
    byShard.foreach { case (shard, rs) =>
      val pos = rs.map(_._4).sorted
      assert(pos.head == next && pos.last == next + rs.length - 1,
        s"shard $shard not contiguous at offset $next")
      // within the shard, global_pos = offset + pos_in_shard
      assert(rs.forall(r => r._4 == (next - 1) + r._3))
      next += rs.length
    }
    // the permutation must be the md5 order, not insertion order: at
    // least one shard must NOT be sorted by doc_id (all-sorted means
    // the hash key silently fell out of the window)
    assert(byShard.exists { case (_, rs) =>
      val ids = rs.sortBy(_._3).map(_._1).toSeq
      ids != ids.sorted
    }, "every shard in doc_id order — shuffle key lost")
    val again = graft.SparkEntry.queries("corpus_shuffle")(s0, sf("sf0.001"))
      .select("doc_id", "global_pos").as[(Long, Long)].collect().toMap
    assert(rows.map(r => r._1 -> r._4).toMap == again, "shuffle must be reproducible")
  }

  test("split_leakage_safe: no cluster straddles splits, unclustered docs keep the plain hash split, non-vacuous") {
    val s = spark
    import s.implicits._
    val dir = sf("sf0.001")
    val got = Sampling.queries("split_leakage_safe")(s, dir)
      .as[(Long, Long, String)].collect()
    val splitOf = got.map(t => t._1 -> t._3).toMap
    val labels = NearDedup.clusterLabels(s, dir)
      .as[(Long, Long)].collect()
    // the leakage guarantee: every cluster is entirely inside ONE split
    labels.groupBy(_._2).foreach { case (cid, members) =>
      val splits = members.map(m => splitOf(m._1)).distinct
      assert(splits.length == 1, s"cluster $cid straddles splits: $splits")
    }
    // unclustered docs are split exactly like split_train_test (the
    // plain doc_id hash) — the guard changes ONLY clustered docs
    val plain = Sampling.splitAssign(
      graft.Tables(s, dir).documents.select("doc_id"), "doc_id")
      .as[(Long, String)].collect().toMap
    val clustered = labels.map(_._1).toSet
    got.filterNot(t => clustered(t._1)).foreach { t =>
      assert(t._2 == t._1, s"unclustered ${t._1} must key on itself")
      assert(t._3 == plain(t._1), s"unclustered ${t._1} split changed")
    }
    // non-vacuous on this fixture: at least one clustered doc lands in
    // a different split than its plain hash would give — the exact
    // failure mode the op exists to prevent
    val moved = got.filter(t => clustered(t._1)).filter(t => t._3 != plain(t._1))
    assert(moved.nonEmpty,
      "fixture has no doc whose split changes under cluster keying — vacuous")
  }
}
