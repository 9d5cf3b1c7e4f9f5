package graft.llm

import graft.SparkSpec

/** WordPiece trainer + greedy encoder: the likelihood-scored merge loop
  * must reproduce, exactly, what a naive single-machine implementation
  * (re-implemented here from scratch, BigInt arithmetic) computes; the
  * native greedy matcher must obey the published longest-match-first /
  * all-or-nothing-[UNK] rules.
  */
class WordPieceSpec extends SparkSpec {

  /** Independent reference trainer: tagged symbols, exact BigInt
    * score_e18 = floor(cnt*1e18/(ca*cb)), ties (score desc, cnt desc,
    * a, b) byte-lexicographic.
    */
  private def naive(corpus: Seq[String], k: Int, minPairCount: Long = 2)
      : Seq[(Int, String, String, Long, Long)] = {
    val E18 = BigInt(10).pow(18)
    var words: Map[Vector[String], Long] = corpus
      .flatMap(_.split(" ")).filter(_.nonEmpty)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
      .map { case (w, f) =>
        val cps = w.codePoints().toArray.map(cp => new String(Character.toChars(cp)))
        cps.zipWithIndex.map { case (c, i) =>
          (if (i == 0) "0" else "1") + c
        }.toVector -> f
      }
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long, Long)]
    var rank = 0
    var done = false
    while (rank < k && !done) {
      val pair = scala.collection.mutable.Map.empty[(String, String), Long]
      val unit = scala.collection.mutable.Map.empty[String, Long]
      words.foreach { case (sym, f) =>
        sym.foreach(s => unit(s) = unit.getOrElse(s, 0L) + f)
        sym.zip(sym.tail).foreach(p => pair(p) = pair.getOrElse(p, 0L) + f)
      }
      val cand = pair.toSeq.filter(_._2 >= minPairCount).map { case ((a, b), c) =>
        (a, b, c, (BigInt(c) * E18 / (BigInt(unit(a)) * BigInt(unit(b)))).toLong)
      }
      if (cand.isEmpty) done = true
      else {
        val (a, b, c, s) = cand.minBy { case (a, b, c, s) => (-s, -c, a, b) }(
          Ordering.Tuple4(Ordering.Long, Ordering.Long, Bpe.utf8Order, Bpe.utf8Order))
        out += ((rank, a, b, c, s))
        val merged = a + b.substring(1)
        words = words.map { case (sym, f) =>
          val acc = scala.collection.mutable.ArrayBuffer.empty[String]
          sym.foreach { x =>
            if (acc.nonEmpty && acc.last == a && x == b) acc(acc.size - 1) = merged
            else acc += x
          }
          (acc.toVector, f)
        }
        rank += 1
      }
    }
    out.toSeq
  }

  private def docsOf(texts: Seq[String]) = {
    val s0 = spark
    import s0.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
  }

  test("train matches the naive reference (ranks, pairs, counts, scores) on a likelihood-discriminating corpus") {
    // designed so the LIKELIHOOD argmax differs from the raw-count
    // argmax: "xy" is frequent but x,y are ubiquitous; "qz" is rarer
    // but q,z appear ONLY together, so cnt/(ca*cb) ranks qz first —
    // a BPE-score trainer picks xy, a WordPiece trainer must pick qz
    val corpus = Seq.fill(8)("xxyxy xyxy") ++ Seq.fill(3)("qz") ++ Seq.fill(5)("xaya")
    val got = WordPiece.train(docsOf(corpus), k = 6)
      .map(m => (m.rank, m.leftT, m.rightT, m.pair_count, m.score_e18))
    val want = naive(corpus, 6)
    assert(got == want, s"\ngot:  $got\nwant: $want")
    // and the discrimination actually bit: the first merge is NOT the
    // most frequent pair
    assert(got.head._2 == "0q" && got.head._3 == "1z", got.head)
  }

  test("local and distributed training paths are identical") {
    val corpus = Seq.fill(4)("abab baba") ++ Seq.fill(3)("ccc") ++ Seq("a#b ##x")
    val local = WordPiece.train(docsOf(corpus), k = 5)
    val dist = WordPiece.train(docsOf(corpus), k = 5, maxLocalVocab = 0)
    assert(local == dist, s"\nlocal: $local\ndist:  $dist")
    assert(local.nonEmpty)
  }

  test("greedy encode: longest match wins, continuations tagged, [UNK] is all-or-nothing") {
    val s0 = spark
    import s0.implicits._
    graft.functions.WordPieceEncode.ensureRegistered(s0)
    // tagged vocab: initial {hug, h, f, face}, continuations {##ging, ##g, ##u, ##ace}
    val vocab = Seq("0hug", "0h", "0f", "0face", "1ging", "1g", "1u", "1ace")
    val rows = Seq("hugging", "face", "hug", "hugg", "zzq", "f", "hu")
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
    val got = WordPiece.encodeDocs(rows, vocab)
      .orderBy("doc_id").collect()
      .map(_.getSeq[String](1).toList).toList
    assert(got == List(
      List("hug", "##ging"),      // longest at both positions
      List("face"),               // whole-word piece beats f + ##ace
      List("hug"),
      List("hug", "##g"),
      List("[UNK]"),              // no initial 'z' piece -> whole word UNK
      List("f"),
      List("h", "##u")),          // both single-char pieces present
      got.toString)
  }

  test("encode of the training corpus has zero [UNK] (every char is in the vocab by construction)") {
    val dir = sf("sf0.001")
    val df = graft.SparkEntry.queries("wordpiece_encode")(spark, dir)
    val unk = df.agg(org.apache.spark.sql.functions.sum("n_unk")).collect()(0).getLong(0)
    assert(unk == 0L, s"training-corpus encode produced $unk [UNK] tokens")
    // and it is non-vacuous: merges actually fire, so some doc has
    // fewer tokens than characters
    val (ms, _) = WordPiece.trainedModel(spark, dir)
    assert(ms.size == WordPiece.K, s"fixture must train the full ${WordPiece.K} merges, got ${ms.size}")
  }

  test("supplementary-plane words: matching advances by code points") {
    val s0 = spark
    import s0.implicits._
    graft.functions.WordPieceEncode.ensureRegistered(s0)
    val astral = new String(Character.toChars(0x1F600)) // one cp, two UTF-16 units
    val vocab = Seq("0" + astral, "1" + astral, "0a", "1b")
    val rows = Seq((0L, astral + astral), (1L, "a" + astral)).toDF("doc_id", "text")
    val got = WordPiece.encodeDocs(rows, vocab).orderBy("doc_id").collect()
      .map(_.getSeq[String](1).toList).toList
    assert(got == List(List(astral, "##" + astral), List("a", "##" + astral)), got.toString)
  }
}
