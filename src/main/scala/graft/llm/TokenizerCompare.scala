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

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "tokenizer_compare" -> ((s, dir) => {
      val docs = Tables(s, dir).documents
      val nWords = docs.select(
        sum(size(filter(split(col("text"), " "), w => length(w) > 0)))
          .cast("long").as("total_words"))
      def fam(name: String, tokens: DataFrame): DataFrame =
        tokens.agg(sum(col("n")).cast("long").as("total_tokens"))
          .select(lit(name).as("tokenizer"), col("total_tokens"))
      val bpe = fam("bpe",
        Bpe.encodeDocs(docs.select("doc_id", "text"), Bpe.trainedMerges(s, dir))
          .select(size(col("bpe")).cast("long").as("n")))
      val wp = fam("wordpiece",
        WordPiece.encodeDocs(docs, WordPiece.trainedModel(s, dir)._2)
          .select(size(col("wp")).cast("long").as("n")))
      val uni = fam("unigram",
        Unigram.encodeDocs(docs, Unigram.trainedModel(s, dir))
          .select(col("n_tokens").as("n")))
      bpe.unionByName(wp).unionByName(uni)
        .crossJoin(broadcast(nWords))
        .withColumn("fertility_e6",
          expr("(2 * total_tokens * 1000000 + total_words) DIV (2 * total_words)"))
        .select("tokenizer", "total_tokens", "total_words", "fertility_e6")
        .orderBy("tokenizer")
    })
  )

  def oracleSql: Map[String, String] = {
    val forDir = for {
      dir <- graft.Engine.lastFixtureDir
      ms <- Bpe.liveMergesFor(dir)
      wv <- WordPiece.liveVocabFor(dir)
      um <- Unigram.liveModelFor(dir)
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
           |FROM fam ORDER BY tokenizer""".stripMargin)
    }
    forDir.getOrElse(Map.empty)
  }
}
