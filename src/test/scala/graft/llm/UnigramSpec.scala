package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Unigram-LM seed training + exact-Viterbi decode: the trainer must
  * reproduce a naive substring-count reference; the decoder must pick
  * the segmentation a brute-force enumeration over the SAME quantized
  * integer costs picks, with the declared (cost, n_pieces, path-bytes)
  * tie-break.
  */
class UnigramSpec extends SparkSpec {

  private def docsOf(texts: Seq[String]) = {
    val s0 = spark
    import s0.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
  }

  test("train: substring weights + char closure + byte-ordered top-K match a naive reference") {
    val corpus = Seq("abab abab ba", "aaab c", "abab")
    val words = corpus.flatMap(_.split(" ")).filter(_.nonEmpty)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val weights = scala.collection.mutable.Map.empty[String, Long]
    for ((w, f) <- words; i <- 0 until w.length; l <- 1 to math.min(4, w.length - i))
      weights(w.substring(i, i + l)) = weights.getOrElse(w.substring(i, i + l), 0L) + f
    val chars = weights.filter(_._1.length == 1)
    val multi = weights.filter(_._1.length >= 2).toSeq
      .sortBy { case (p, wt) => (-wt, p) }(
        Ordering.Tuple2(Ordering.Long, Bpe.utf8Order)).take(Unigram.MultiPieces)
    val want = (chars.toSeq.map { case (p, wt) => (p, wt, true) } ++
      multi.map { case (p, wt) => (p, wt, false) }).sortBy(_._1)(Bpe.utf8Order)
    val df = Unigram.vocabDf(docsOf(corpus))
      .select(col("p"), col("weight").cast("long"), col("is_char"))
      .orderBy("p").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getBoolean(2))).toSeq
    assert(df == want, s"\ngot:  $df\nwant: $want")
  }

  test("Viterbi: min quantized cost wins; ties break by fewer pieces then path bytes") {
    val s0 = spark
    import s0.implicits._
    graft.functions.UnigramEncode.ensureRegistered(s0)
    // model with hand-chosen integer costs
    val model: Seq[(String, Long, Long)] = Seq(
      ("a", 0L, 50L), ("b", 0L, 60L), ("ab", 0L, 90L), ("ba", 0L, 200L),
      ("aba", 0L, 160L), ("c", 0L, 10L), ("d", 0L, 40L), ("cd", 0L, 50L))
    // brute force over all segmentations with pieces <= 4 cp
    def brute(w: String): (Long, Long, String) = {
      val lp = model.map(m => m._1 -> m._3).toMap
      def segs(s: String): Seq[List[String]] =
        if (s.isEmpty) Seq(Nil)
        else (1 to math.min(4, s.length)).flatMap { l =>
          val p = s.substring(0, l)
          if (lp.contains(p)) segs(s.substring(l)).map(p :: _) else Nil
        }
      val all = segs(w).map(ps => (ps.map(lp).sum, ps.size.toLong, ps.mkString(" ")))
      all.min(Ordering.Tuple3(Ordering.Long, Ordering.Long, Bpe.utf8Order))
    }
    val words = Seq("abab", "aba", "abba", "cd", "dc", "aaaa")
    val got = Unigram.encodeDocs(
      words.zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text"),
      model)
      .orderBy("doc_id").collect()
      .map(r => (r.getSeq[String](1).mkString(" "), r.getLong(2), r.getLong(3)))
    words.zip(got).foreach { case (w, (path, k, c)) =>
      val (bc, bk, bp) = brute(w)
      assert(path == bp && k == bk && c == bc,
        s"$w: engine ($path, $k, $c) != brute ($bp, $bk, $bc)")
    }
    // "cd" exercises a genuine tie: c+d = 10+40 = 50 = cd; fewer pieces wins
    assert(got(3)._1 == "cd" && got(3)._2 == 1L, got(3))
  }

  test("[LONG] cap and [UNK] fallback behave identically to the documented contract") {
    val s0 = spark
    import s0.implicits._
    graft.functions.UnigramEncode.ensureRegistered(s0)
    val model: Seq[(String, Long, Long)] = Seq(("a", 0L, 7L))
    val long = "a" * (graft.functions.UnigramEncode.MaxWordCp + 1)
    val rows = Seq((0L, long), (1L, "az"), (2L, "a"))
    val got = Unigram.encodeDocs(rows.toDF("doc_id", "text"), model)
      .orderBy("doc_id").collect()
      .map(r => (r.getSeq[String](1).toList, r.getLong(2), r.getLong(3))).toList
    assert(got(0) == ((List("[LONG]"), 1L, 0L)), got(0))
    assert(got(1) == ((List("[UNK]"), 1L, 0L)), got(1))   // 'z' unreachable
    assert(got(2) == ((List("a"), 1L, 7L)), got(2))
  }

  test("fixture encode: zero [UNK] (char closure) and cost consistency") {
    val dir = sf("sf0.001")
    val df = graft.SparkEntry.queries("unigram_encode")(spark, dir)
    val model = Unigram.trainedModel(spark, dir)
    assert(model.count(!_._1.isEmpty) == model.size)
    val enc = Unigram.encodeDocs(graft.Tables(spark, dir).documents, model)
    val unk = enc.select(sum(size(filter(col("toks"), t => t === lit("[UNK]")))))
      .collect()(0).getLong(0)
    assert(unk == 0L, s"training-corpus encode produced $unk [UNK] words")
    assert(df.count() == 500)
  }

  test("one Viterbi-EM step: likelihood improves, vocab prunes to a seed subset") {
    val s = spark
    import s.implicits._
    val dir = sf("sf0.001")
    val m0 = Unigram.trainedModel(s, dir)
    val m1 = Unigram.emModel(s, dir)
    // EM prune: strictly fewer pieces (substring-seeded inventories
    // always carry Viterbi-unused pieces), all from the seed vocab,
    // with the char closure's used subset and ≥1 multi-char survivor
    assert(m1.nonEmpty && m1.size < m0.size, s"${m1.size} vs seed ${m0.size}")
    val p0 = m0.map(_._1).toSet
    assert(m1.forall(r => p0.contains(r._1)), "EM vocab ⊄ seed vocab")
    assert(m1.exists(_._1.length > 1), "no multi-char piece survived")
    // Hard-EM monotonicity on the corpus negative log-likelihood: the
    // M-step's ML weights minimize the cross-entropy of the E-step's
    // segmentation counts (Gibbs), and the next Viterbi only improves
    // on that segmentation — so total quantized cost must not rise
    // beyond the per-token ±1 nano-unit rounding slack.
    val docs = graft.Tables(s, dir).documents
    val c0 = Unigram.encodeDocs(docs, m0)
      .agg(sum("cost_e9").as("c")).select(col("c")).as[Long].head()
    val n0 = Unigram.encodeDocs(docs, m0)
      .agg(sum("n_tokens").as("n")).select(col("n")).as[Long].head()
    val c1 = Unigram.encodeDocs(docs, m1)
      .agg(sum("cost_e9").as("c")).select(col("c")).as[Long].head()
    assert(c1 <= c0 + n0, s"EM raised total Viterbi cost: $c1 > $c0 (+$n0 slack)")
    // and the corpus still encodes without [UNK] (closure preserved:
    // every word's own seed segmentation survives the prune verbatim)
    val unkEm = Unigram.encodeDocs(docs, m1)
      .select(sum(size(filter(col("toks"), t => t === lit("[UNK]")))))
      .collect()(0).getLong(0)
    assert(unkEm == 0L, s"EM-pruned model produced $unkEm [UNK] words")
  }
}
