package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Cross-family tokenizer evaluation (round 17) — the table a data
  * team reads to CHOOSE a tokenizer before a training run: for each of
  * the three engine-trained families (BPE, WordPiece, unigram-LM), the
  * corpus-wide token total and fertility (tokens/word) under the SAME
  * corpus and word filter. The multilingual-fairness rationale of
  * `bpe_fertility`, applied across families instead of languages.
  *
  * Engine: each family's distinct-word-cached encode runs once, then
  * ONE 3-row union of corpus aggregates; fertility is the exact
  * half-up BIGINT rational ((2·t·10⁶ + w) div 2w — no IEEE value on
  * the compare path). Oracle: the three per-doc model-embedding
  * replays (merge fold, greedy walk, unrolled Viterbi DP) aggregated
  * as subqueries in one statement — dir-keyed dynamic, present only
  * when all three models are live for the dump's dir.
  */
object TokenizerCompare {

  /** Deterministic half-budget model subsets (round 18,
    * `tokenizer_budget`) — pure functions of the FULL trained models,
    * shared by the query and the oracle emitter so the two can never
    * embed different subsets. "Half" = half the LEARNED inventory: 8 of
    * 16 BPE merges; WordPiece base symbols + the first 8 merges'
    * pieces (training order); unigram char closure + the top-32 of 64
    * multi-char pieces under the trainer's own (weight DESC, piece)
    * order, costs re-quantized against the subset total exactly like
    * the full model's build.
    */
  private[llm] def bpeHalf(ms: Seq[Bpe.Merge]): Seq[Bpe.Merge] =
    ms.take(ms.size / 2)

  private[llm] def wpHalf(ms: Seq[WordPiece.Merge], vocab: Seq[String]): Seq[String] = {
    // base symbols = 1-codepoint materials (merged materials are ≥2 cp)
    val base = vocab.filter { v =>
      val m = v.substring(1); m.codePointCount(0, m.length) == 1
    }
    (base ++ ms.take(ms.size / 2).map(_.mergedT)).distinct.sorted(Bpe.utf8Order)
  }

  private[llm] def uniHalf(model: Seq[(String, Long, Long)]): Seq[(String, Long, Long)] = {
    def cp(s: String) = s.codePointCount(0, s.length)
    val chars = model.filter(r => cp(r._1) == 1)
    val multi = model.filter(r => cp(r._1) >= 2)
      .sortWith((a, b) => a._2 > b._2 ||
        (a._2 == b._2 && Bpe.utf8Order.compare(a._1, b._1) < 0))
      .take(Unigram.MultiPieces / 2)
    val sub = chars ++ multi
    val total = sub.map(_._2).sum.toDouble
    sub.map { case (p, f, _) => (p, f, math.round(1e9 * math.log(total / f))) }
      .sortBy(_._1)(Bpe.utf8Order)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "tokenizer_compare" -> ((s, dir) => {
      // r18-opt (guide §1.2, the tokenizer_budget precedent): corpus
      // totals are Σ freq(w)·tokens-per-word over ONE word-frequency
      // aggregate — each family's encode runs once per DISTINCT word
      // in a single vocab-sized projection, and no per-doc token array
      // is ever rebuilt (the old form ran all three full encodeDocs
      // join+collect_list reassemblies only to sum the sizes). Exact:
      // every family encodes per word independently under the same
      // length>0 word filter, and total_words = Σ freq by definition.
      graft.functions.WordPieceEncode.ensureRegistered(s)
      graft.functions.UnigramEncode.ensureRegistered(s)
      val docs = Tables(s, dir).documents
      val wf = graft.Engine.spread(docs, "doc_id")
        .select(explode(filter(split(col("text"), " "),
          w => length(w) > 0)).as("w"))
        .groupBy("w").agg(count(lit(1)).as("freq"))
      val bpeToks = Bpe.applyMerges(
        concat(split(col("w"), ""), array(lit(Bpe.Eow))),
        Bpe.trainedMerges(s, dir))
      val wpToks = graft.functions.WordPieceEncode.wordpiece_encode_word(
        col("w"), typedLit(WordPiece.trainedModel(s, dir)._2))
      val uniSeg = graft.functions.UnigramEncode.unigram_encode_word(
        col("w"), typedLit(Unigram.trainedModel(s, dir)
          .map { case (p, _, lp) => s"$lp$p" }))
      val totals = wf
        .select(col("freq"),
          (col("freq") * size(bpeToks).cast("long")).as("tb"),
          (col("freq") * size(wpToks).cast("long")).as("tw"),
          (col("freq") * uniSeg.getField("n_tokens")).as("tu"))
        .agg(sum(col("freq")).cast("long").as("total_words"),
          sum(col("tb")).cast("long").as("tb"),
          sum(col("tw")).cast("long").as("tw"),
          sum(col("tu")).cast("long").as("tu"))
      totals
        .selectExpr("total_words",
          "stack(3, 'bpe', tb, 'unigram', tu, 'wordpiece', tw)" +
            " AS (tokenizer, total_tokens)")
        .withColumn("fertility_e6",
          expr("(2 * total_tokens * 1000000 + total_words) DIV (2 * total_words)"))
        .select("tokenizer", "total_tokens", "total_words", "fertility_e6")
        .orderBy("tokenizer")
    }),

    // Vocab-budget sweep across the trio (round 18, VERDICT growth
    // item b) — the table a team reads BEFORE fixing a vocab budget:
    // for each family at half and full learned-inventory size, corpus
    // fertility and freq-weighted unsegmentable-word coverage. All
    // totals are WORD-level (Σ freq·tokens-per-word over the
    // distinct-word table — the tokenizer_compare discipline): six
    // small word-cache encodes, never a per-doc token stream. BPE can
    // never emit [UNK] (char fallback is structural), so its coverage
    // column is the 0 literal in both engines.
    "tokenizer_budget" -> ((s, dir) => {
      graft.functions.WordPieceEncode.ensureRegistered(s)
      graft.functions.UnigramEncode.ensureRegistered(s)
      val docs = Tables(s, dir).documents
      // r19 measured rejection: an Engine.spread before this explode
      // (the tokenizer_compare precedent) measured flat-to-worse at
      // sf0.1 (0.79 -> 0.88 s against near-identical ambience controls)
      // — the explode feeds a map-side PARTIAL aggregate that collapses
      // the gram stream inside the scan task, and the dominant cost
      // (six per-word encodes) already runs post-shuffle on the
      // distinct-word table; the extra full-text exchange bought
      // nothing.
      val wf = docs.select(explode(split(col("text"), " ")).as("w"))
        .filter(length(col("w")) > 0)
        .groupBy("w").agg(count(lit(1)).as("freq"))
      val msFull = Bpe.trainedMerges(s, dir)
      val (wpMs, wpVocab) = WordPiece.trainedModel(s, dir)
      val uniFull = Unigram.trainedModel(s, dir)
      val tw = wf.agg(sum("freq").cast("long").as("total_words"))

      // each family's encode expression is STAGED as one column before
      // n/u are derived — the native encodes are CodegenFallback and
      // never CSE'd, so a twice-referenced expression would run the
      // whole per-word encode twice (the vec_pq/text_diversity lesson)
      def arm(name: String, label: String, size: Long,
          staged: DataFrame): DataFrame =
        staged
          .agg(sum(col("freq") * col("n")).cast("long").as("total_tokens"),
            sum(when(col("u"), col("freq")).otherwise(0L)).cast("long").as("unk_words"))
          .select(lit(name).as("tokenizer"), lit(label).as("budget"),
            lit(size).as("model_size"), col("total_tokens"), col("unk_words"))

      def bpeArm(label: String, ms: Seq[Bpe.Merge]) =
        arm("bpe", label, ms.size.toLong,
          wf.select(col("freq"),
            size(Bpe.applyMerges(
              concat(split(col("w"), ""), array(lit(Bpe.Eow))), ms))
              .cast("long").as("n"),
            lit(false).as("u")))
      def wpArm(label: String, vocab: Seq[String]) =
        arm("wordpiece", label, vocab.size.toLong,
          wf.select(col("freq"),
            graft.functions.WordPieceEncode
              .wordpiece_encode_word(col("w"), typedLit(vocab)).as("toks"))
            .select(col("freq"), size(col("toks")).cast("long").as("n"),
              array_contains(col("toks"), "[UNK]").as("u")))
      def uniArm(label: String, model: Seq[(String, Long, Long)]) = {
        val packed = typedLit(model.map { case (p, _, lp) => s"$lp$p" })
        arm("unigram", label, model.size.toLong,
          wf.select(col("freq"),
            graft.functions.UnigramEncode
              .unigram_encode_word(col("w"), packed).as("seg"))
            .select(col("freq"), col("seg.n_tokens").as("n"),
              (array_contains(col("seg.toks"), "[UNK]") ||
                array_contains(col("seg.toks"), "[LONG]")).as("u")))
      }

      bpeArm("full", msFull).unionByName(bpeArm("half", bpeHalf(msFull)))
        .unionByName(wpArm("full", wpVocab))
        .unionByName(wpArm("half", wpHalf(wpMs, wpVocab)))
        .unionByName(uniArm("full", uniFull))
        .unionByName(uniArm("half", uniHalf(uniFull)))
        .crossJoin(broadcast(tw))
        .withColumn("fertility_e6",
          expr("(2 * total_tokens * 1000000 + total_words) DIV (2 * total_words)"))
        .select("tokenizer", "budget", "model_size", "total_tokens",
          "unk_words", "total_words", "fertility_e6")
        .orderBy("tokenizer", "budget")
    })
  )

  def oracleSql: Map[String, String] = {
    val forDir = for {
      dir <- graft.Engine.lastFixtureDir
      ms <- Bpe.liveMergesFor(dir)
      wv <- WordPiece.liveVocabFor(dir)
      um <- Unigram.liveModelFor(dir)
      wfull <- WordPiece.liveFullFor(dir)
    } yield {
      // Round-18 restructure (VERDICT task 1): each family's replay is
      // a WORD-LEVEL total (Σ freq·|toks(w)| — see Bpe.totalTokensSql)
      // wrapped in its own MATERIALIZED top-level CTE, so DuckDB
      // evaluates the three pipelines one at a time and releases each
      // before the next (the dedup_incremental precedent). The previous
      // shape aggregated three PER-DOC replays as bare subqueries of one
      // union — at 25× the per-doc token-array materialization ×3
      // needed a raised DuckDB memory limit; word-level state is
      // bounded by the distinct-word table regardless of corpus size.
      val bpeSub = Bpe.totalTokensSql(ms)
      val wpSub = WordPiece.totalTokensSql(wv)
      val uniSub = Unigram.totalTokensSql(um)
      Map("tokenizer_compare" ->
        s"""WITH tw AS MATERIALIZED (
           |  SELECT CAST(sum(len(list_filter(string_split(text, ' '),
           |    x -> len(x) > 0))) AS BIGINT) AS w FROM documents),
           |bpe_t AS MATERIALIZED (SELECT n_tokens FROM ($bpeSub)),
           |uni_t AS MATERIALIZED (SELECT n_tokens FROM ($uniSub)),
           |wp_t AS MATERIALIZED (SELECT n_tokens FROM ($wpSub)),
           |fam AS (
           |  SELECT 'bpe' AS tokenizer, n_tokens AS total_tokens FROM bpe_t
           |  UNION ALL
           |  SELECT 'unigram', n_tokens FROM uni_t
           |  UNION ALL
           |  SELECT 'wordpiece', n_tokens FROM wp_t)
           |SELECT tokenizer, total_tokens,
           |  (SELECT w FROM tw) AS total_words,
           |  CAST((2 * total_tokens * 1000000 + (SELECT w FROM tw))
           |    // (2 * (SELECT w FROM tw)) AS BIGINT) AS fertility_e6
           |FROM fam ORDER BY tokenizer""".stripMargin,

      // the budget sweep: six word-level arm replays (each its own
      // MATERIALIZED scope), half subsets reconstructed from the SAME
      // live models by the shared bpeHalf/wpHalf/uniHalf rules
      "tokenizer_budget" -> {
        val msH = bpeHalf(ms)
        val wvH = wpHalf(wfull._1, wfull._2)
        val umH = uniHalf(um)
        def armSel(alias: String, sub: String, withUnk: Boolean): String =
          if (withUnk) s"$alias AS MATERIALIZED (SELECT n_tokens, unk_words FROM ($sub))"
          else s"$alias AS MATERIALIZED (SELECT n_tokens FROM ($sub))"
        def famRow(tok: String, budget: String, size: Long, alias: String,
            withUnk: Boolean): String =
          s"""SELECT '$tok' AS tokenizer, '$budget' AS budget,
             |    CAST($size AS BIGINT) AS model_size,
             |    n_tokens AS total_tokens,
             |    ${if (withUnk) "unk_words" else "CAST(0 AS BIGINT) AS unk_words"}
             |  FROM $alias""".stripMargin
        s"""WITH tw AS MATERIALIZED (
           |  SELECT CAST(sum(len(list_filter(string_split(text, ' '),
           |    x -> len(x) > 0))) AS BIGINT) AS w FROM documents),
           |${armSel("b_f", Bpe.totalTokensSql(ms), withUnk = false)},
           |${armSel("b_h", Bpe.totalTokensSql(msH), withUnk = false)},
           |${armSel("w_f", WordPiece.totalTokensSql(wv), withUnk = true)},
           |${armSel("w_h", WordPiece.totalTokensSql(wvH), withUnk = true)},
           |${armSel("u_f", Unigram.totalTokensSql(um), withUnk = true)},
           |${armSel("u_h", Unigram.totalTokensSql(umH), withUnk = true)},
           |fam AS (
           |  ${famRow("bpe", "full", ms.size.toLong, "b_f", withUnk = false)}
           |  UNION ALL
           |  ${famRow("bpe", "half", msH.size.toLong, "b_h", withUnk = false)}
           |  UNION ALL
           |  ${famRow("wordpiece", "full", wv.size.toLong, "w_f", withUnk = true)}
           |  UNION ALL
           |  ${famRow("wordpiece", "half", wvH.size.toLong, "w_h", withUnk = true)}
           |  UNION ALL
           |  ${famRow("unigram", "full", um.size.toLong, "u_f", withUnk = true)}
           |  UNION ALL
           |  ${famRow("unigram", "half", umH.size.toLong, "u_h", withUnk = true)})
           |SELECT tokenizer, budget, model_size, total_tokens, unk_words,
           |  (SELECT w FROM tw) AS total_words,
           |  CAST((2 * total_tokens * 1000000 + (SELECT w FROM tw))
           |    // (2 * (SELECT w FROM tw)) AS BIGINT) AS fertility_e6
           |FROM fam ORDER BY tokenizer, budget""".stripMargin
      })
    }
    forDir.getOrElse(Map.empty)
  }
}
