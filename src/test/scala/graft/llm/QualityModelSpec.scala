package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hashed-ngram logistic quality scorer: deterministic training, real
  * separation (AUC on HELD-OUT planted docs), and local ≡ distributed
  * gradient-path parity.
  */
class QualityModelSpec extends SparkSpec {
  import spark.implicits._

  /** Rank-based AUC of scores: P(score(good) > score(bad)) with the
    * tie-correction of the Mann-Whitney U statistic.
    */
  private def auc(scored: Seq[(Double, Double)]): Double = {
    val sorted = scored.sortBy(_._1)
    // average ranks over ties
    val ranks = new Array[Double](sorted.length)
    var i = 0
    while (i < sorted.length) {
      var j = i
      while (j < sorted.length && sorted(j)._1 == sorted(i)._1) j += 1
      val r = (i + 1 + j) / 2.0
      (i until j).foreach(k => ranks(k) = r)
      i = j
    }
    val nPos = sorted.count(_._2 == 1.0).toDouble
    val nNeg = sorted.length - nPos
    val rPos = sorted.zip(ranks).filter(_._1._2 == 1.0).map(_._2).sum
    (rPos - nPos * (nPos + 1) / 2.0) / (nPos * nNeg)
  }

  test("held-out AUC >= 0.95 on the planted good/bad fixture split") {
    val docs = graft.Tables(spark, sf("sf0.001")).documents
    val (tr, heldOut) = QualityModel.trainSplit(QualityModel.plantedTraining(docs))
    val w = QualityModel.train(tr)
    val scored = QualityModel.score(heldOut.select("doc_id", "text"), w)
      .join(heldOut.select("doc_id", "y"), "doc_id")
      .select("score", "y").as[(Double, Double)].collect().toSeq
    assert(scored.nonEmpty)
    val a = auc(scored)
    assert(a >= 0.95, s"held-out AUC $a below 0.95 — the model failed to separate")
    // and the separation is directional: good scores above bad on average
    val good = scored.filter(_._2 == 1.0).map(_._1)
    val bad = scored.filter(_._2 == 0.0).map(_._1)
    assert(good.sum / good.size > bad.sum / bad.size + 0.2)
  }

  test("training is deterministic: same corpus, same weights, same scores") {
    val docs = graft.Tables(spark, sf("sf0.001")).documents
    val (tr, _) = QualityModel.trainSplit(QualityModel.plantedTraining(docs))
    val w1 = QualityModel.train(tr)
    val w2 = QualityModel.train(tr.repartition(8)) // partitioning-invariant
    assert(w1.sameElements(w2), "weights must be bit-identical across runs")
    val s1 = graft.SparkEntry.queries("quality_model_score")(spark, sf("sf0.001")).collect()
    val s2 = graft.SparkEntry.queries("quality_model_score")(spark, sf("sf0.001")).collect()
    assert(s1.map(_.toSeq).toSeq == s2.map(_.toSeq).toSeq)
  }

  test("local and distributed gradient paths agree within float tolerance") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank", 1.0),
      (2L, "a calm morning walk through the old town square was pleasant", 1.0),
      (3L, "buy now click here free winner limited offer buy now click", 0.0),
      (4L, "free free free winner winner click click offer offer now now", 0.0),
      (5L, "she read the long novel quietly by the warm fire last night", 1.0),
      (6L, "click free buy winner now offer click free buy winner now offer", 0.0)
    ).toDF("doc_id", "text", "y")
    val wLocal = QualityModel.train(corpus, iters = 25)
    val wDist = QualityModel.train(corpus, iters = 25, maxLocalTriples = 0L)
    val maxDelta = wLocal.zip(wDist).map { case (a, b) => math.abs(a - b) }.max
    assert(maxDelta < 1e-9, s"paths diverged: max |delta| = $maxDelta")
    // both models separate the planted corpus
    val scored = QualityModel.score(corpus.select("doc_id", "text"), wLocal)
      .join(corpus.select("doc_id", "y"), "doc_id")
      .select("score", "y").as[(Double, Double)].collect().toSeq
    assert(auc(scored) == 1.0, s"in-sample AUC should be perfect on the planted corpus")
  }

  test("perplexity: repeated in-distribution text scores lower than unseen-vocab text") {
    // train split = even ids; doc 0's phrase repeats across the split,
    // so its transitions are high-probability; doc 1 (odd, scored only)
    // reuses that phrase — LOW ppl; doc 3's vocabulary never occurs in
    // the train split — its transitions all fall to the smoothing floor,
    // HIGH ppl
    val docs = Seq(
      (0L, "the cat sat on the mat and the cat sat again"),
      (2L, "the cat sat on the mat and the dog sat too"),
      (4L, "the cat sat on the mat near the dog today"),
      (1L, "the cat sat on the mat"),
      (3L, "zulu xray yankee quebec victor whiskey november")
    ).toDF("doc_id", "text")
    val ppl = QualityModel.perplexity(docs)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(ppl.keySet == Set(0L, 1L, 2L, 3L, 4L))
    assert(ppl(1L) < ppl(3L) / 3,
      s"in-distribution text must score far below unseen vocab: $ppl")
    // smoothing keeps every score finite and positive
    ppl.values.foreach(p => assert(p > 0 && !p.isInfinite))
  }

  test("quality_model_score id: one score per corpus doc, probabilities in [0,1]") {
    val df = graft.SparkEntry.queries("quality_model_score")(spark, sf("sf0.001"))
    val rows = df.collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      val sc = r.getAs[Double]("score")
      // 6-dp rounding can saturate a confident sigmoid to exactly 0/1
      assert(sc >= 0.0 && sc <= 1.0, s"score out of range: $sc")
    }
    // the corpus docs are the GOOD side of the planted fixture: the
    // model should call most of them good
    val high = rows.count(_.getAs[Double]("score") > 0.5)
    assert(high > rows.length * 0.9, s"only $high/${rows.length} score > 0.5")
  }

  test("quality_ensemble equals the majority vote of its three oracle-checked parents; filters actually disagree") {
    val s = spark
    val dir = sf("sf0.001")
    val got = graft.SparkEntry.queries("quality_ensemble")(s, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Boolean]("heuristic_ok"), r.getAs[Boolean]("gopher_ok"),
          r.getAs[Boolean]("model_ok"), r.getAs[Long]("n_votes"),
          r.getAs[Boolean]("keep")))).toMap
    // parents, independently re-run through their own query ids
    val gopher = graft.SparkEntry.queries("gopher_rules")(s, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("keep")).toMap
    val model = graft.SparkEntry.queries("quality_model_score")(s, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> (r.getAs[Double]("score") >= 0.5)).toMap
    val heur = graft.Tables(s, dir).documents
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("text")).collect()
      .map(r => r.getLong(0) ->
        ExactQualityKit.qualityE6(r.getString(1)).exists(_ >= 500000L)).toMap
    assert(got.keySet == gopher.keySet)
    got.foreach { case (d, (h, g, m, n, k)) =>
      assert(h == heur(d) && g == gopher(d) && m == model(d), s"doc $d votes")
      val votes = Seq(h, g, m).count(identity).toLong
      assert(n == votes && k == (votes >= 2), s"doc $d majority")
    }
    // non-vacuous: the ensemble must differ from at least one parent
    // somewhere (else the majority adds nothing on this fixture)
    assert(got.exists { case (d, v) => v._5 != gopher(d) },
      "ensemble never disagrees with the gopher gate")
    assert(got.exists { case (d, v) => v._5 != heur(d) } ||
      got.exists { case (d, v) => v._5 != model(d) },
      "ensemble never disagrees with heuristic or model")
  }

  test("perplexity_buckets: equal-depth per-language terciles, monotone in ppl, covers exactly the scored docs") {
    val s0 = spark
    import s0.implicits._
    val rows = graft.SparkEntry.queries("perplexity_buckets")(s0, sf("sf0.001"))
      .select("doc_id", "lang", "ppl", "tercile", "bucket")
      .as[(Long, String, Double, Long, String)].collect()
    assert(rows.nonEmpty)
    // doc set = exactly the docs text_perplexity scores (>= 2 words)
    val scored = graft.SparkEntry.queries("text_perplexity")(s0, sf("sf0.001"))
      .select("doc_id").as[Long].collect().toSet
    assert(rows.map(_._1).toSet == scored, "bucketed doc set != scored doc set")
    rows.groupBy(_._2).foreach { case (lang, rs) =>
      // equal depth: ntile(3) sizes differ by at most one
      val sizes = rs.groupBy(_._4).view.mapValues(_.size).toMap
      assert(sizes.keySet.subsetOf(Set(1L, 2L, 3L)), s"$lang terciles: ${sizes.keySet}")
      if (rs.size >= 3) {
        assert(sizes.values.max - sizes.values.min <= 1, s"$lang depths: $sizes")
        // CCNet semantics: head holds the LOWEST perplexity (most
        // natural) text; buckets are contiguous ppl ranges
        assert(rs.filter(_._4 == 1L).map(_._3).max <=
          rs.filter(_._4 == 2L).map(_._3).min + 1e-12, s"$lang head>middle")
        assert(rs.filter(_._4 == 2L).map(_._3).max <=
          rs.filter(_._4 == 3L).map(_._3).min + 1e-12, s"$lang middle>tail")
      }
      rs.foreach { r =>
        val want = r._4 match { case 1 => "head"; case 2 => "middle"; case _ => "tail" }
        assert(r._5 == want, s"label mismatch: $r")
      }
    }
  }

  test("perplexity_buckets_approx: sketch thresholds agree with the exact terciles on nearly every doc") {
    val s0 = spark
    import s0.implicits._
    val exact = graft.SparkEntry.queries("perplexity_buckets")(s0, sf("sf0.001"))
      .select("doc_id", "bucket").as[(Long, String)].collect().toMap
    val approx = graft.SparkEntry.queries("perplexity_buckets_approx")(s0, sf("sf0.001"))
      .select("doc_id", "bucket").as[(Long, String)].collect().toMap
    assert(approx.keySet == exact.keySet, "the two formulations must cover the same docs")
    // the t-digest threshold can only flip docs sitting AT a tercile
    // boundary — agreement must be near-total, and disagreements must
    // be to an ADJACENT bucket
    val order = Map("head" -> 0, "middle" -> 1, "tail" -> 2)
    val diffs = exact.keys.filter(k => exact(k) != approx(k)).toSeq
    assert(diffs.size <= math.max(1, exact.size / 20),
      s"${diffs.size}/${exact.size} docs disagree — sketch drifted beyond boundary noise")
    diffs.foreach { k =>
      assert(math.abs(order(exact(k)) - order(approx(k))) == 1,
        s"doc $k jumped a bucket: exact=${exact(k)} approx=${approx(k)}")
    }
  }
}
