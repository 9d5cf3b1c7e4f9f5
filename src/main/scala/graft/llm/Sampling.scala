package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Deterministic corpus sampling / splitting / n-gram statistics — the
  * training-data-pipeline operations a 100 TB run does constantly
  * (SURVEY.md §2.12 family).
  *
  * Sampling here is HASH-based, never `rand()`: the md5 bucket of a
  * stable id is reproducible across runs, engines, partitionings and
  * retries (a nondeterministic sample re-executed after a task failure
  * silently changes the dataset — same hazard class as SPARK-23207), and
  * it is mirrorable 1:1 in the DuckDB oracle. Engine-portable md5 over
  * engine-specific xxhash64 is a deliberate trade: sampling runs once
  * per corpus build, auditability wins.
  *
  * Scale notes: every operator is one narrow projection + (for stats)
  * one map-side-combinable aggregation; the split assignment never
  * shuffles at all.
  */
object Sampling {

  /** md5-derived hash of a stable column: the first `hexDigits` hex
    * digits of md5 as a long — the engine's ONE portable-hash idiom
    * (mirrored in DuckDB as `CAST('0x' || substring(md5(x),1,N) AS
    * BIGINT)`). `hexDigits` must stay ≤ 15: 15 digits = 60 bits keeps
    * both engines inside the signed-64-bit positive range (16 could set
    * the sign bit and the engines disagree on the wrap). Default 4 =
    * the 16-bit sampling bucket (0..65535).
    */
  def hashBucket(id: org.apache.spark.sql.Column, hexDigits: Int = 4): org.apache.spark.sql.Column = {
    require(hexDigits >= 1 && hexDigits <= 15, s"hexDigits out of portable range: $hexDigits")
    conv(substring(md5(id.cast("string")), 1, hexDigits), 16, 10).cast("long")
  }

  /** Keep ~`permille`/65536 of rows, deterministically. */
  def sampleByHash(df: DataFrame, idCol: String, threshold: Int): DataFrame =
    df.withColumn("hb", hashBucket(col(idCol))).filter(col("hb") < threshold)

  /** Reproducible train/val/test assignment by hash range (90/5/5 at the
    * defaults) — the standard leakage-safe corpus split.
    */
  def splitAssign(df: DataFrame, idCol: String,
      trainTo: Int = 58982, valTo: Int = 62259): DataFrame =
    df.withColumn("split",
      when(hashBucket(col(idCol)) < trainTo, "train")
        .when(hashBucket(col(idCol)) < valTo, "val")
        .otherwise("test"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ~10% deterministic sample: same rows every run, any partitioning
    "sample_hash" -> ((s, dir) =>
      sampleByHash(Tables(s, dir).documents, "doc_id", threshold = 6554)
        .select("doc_id", "source", "hb")
        .orderBy("doc_id")),

    // split sizes per source — the audit query run after every split
    "split_train_test" -> ((s, dir) =>
      splitAssign(Tables(s, dir).documents, "doc_id")
        .groupBy("source", "split")
        .agg(count(lit(1)).as("n"))
        .orderBy("source", "split")),

    // corpus-wide top trigram shingles by document frequency: narrow
    // shingle projection → explode → ONE counting aggregate (map-side
    // partials) → top-k. The boilerplate-detection companion to the
    // df-cap in dedup_jaccard.
    "ngram_topk" -> ((s, dir) =>
      NearDedup.shingleArrays(Tables(s, dir).documents)
        .select(explode(col("sh")).as("shingle"))
        .groupBy("shingle")
        .agg(count(lit(1)).as("df"))
        .orderBy(col("df").desc, col("shingle"))
        .limit(20)),

    // Sequence-length histogram (fixed 16-token bins, per source) — the
    // packing-efficiency / truncation-loss audit run before choosing a
    // training context length. Integer bin arithmetic (n − n mod 16, no
    // float floor) so both engines bin identically; one narrow
    // projection + ONE map-side-combinable count, output is bins×
    // sources rows (bounded), never the corpus.
    "seq_len_hist" -> ((s, dir) => {
      val n = size(split(col("text"), " "))
      Tables(s, dir).documents
        .select(col("source"), (n - n % 16).cast("long").as("bin_lo"))
        .groupBy("source", "bin_lo")
        .agg(count(lit(1)).as("n_docs"))
        .orderBy("source", "bin_lo")
    }),

    // Data-mix rate solver (the Pile/Dolma source-weighting step):
    // given target mix weights per source and the tokens actually
    // available, the max achievable corpus size with NO upsampling is
    // T* = min_s(tokens_s / p_s); each source then samples at rate
    // p_s·T*/tokens_s (=1 for the binding source). Weights here derive
    // deterministically from the source id (1 + suffix mod 4, then
    // normalized) so the fixture exercises unequal targets. Shape: one
    // corpus aggregation; everything after runs on the SOURCE table
    // (|sources| rows) with two broadcast scalars — at 100 TB the mix
    // solve is free once per-source token mass exists.
    "mix_rates" -> ((s, dir) => {
      val tok = Tables(s, dir).documents
        .groupBy("source")
        .agg(sum(size(split(col("text"), " "))).cast("double").as("t"))
        .withColumn("w",
          // substr to end-of-string (not a fixed length cap): the DuckDB
          // oracle's substring(source, 4) takes the whole suffix, and a
          // Spark-side length cap would silently diverge on a fixture
          // regeneration with longer source ids
          (lit(1) + col("source").substr(lit(4), length(col("source"))).cast("int") % 4)
            .cast("double"))
      val wsum = tok.agg(sum(col("w")).as("wsum"))
      val p = tok.crossJoin(broadcast(wsum))
        .withColumn("p", col("w") / col("wsum"))
      val tstar = p.agg(min(col("t") / col("p")).as("tstar"))
      p.crossJoin(broadcast(tstar))
        .select(
          col("source"),
          col("t").cast("long").as("n_tokens"),
          round(col("p"), 6).as("weight"),
          // nullif on the availability: a zero-token source would hit
          // 0/0, where Spark (non-ANSI) yields NULL but DuckDB yields
          // NaN — the same latent-mismatch class the punct_ratio guard
          // closes; with the guard both engines agree on NULL
          round(col("p") * col("tstar") / nullif(col("t"), lit(0.0)), 6).as("rate"),
          round(col("p") * col("tstar"), 2).as("sampled_tokens"))
        .orderBy("source")
    }),

    // temperature-scaled mixing (round 13) — the multilingual sampling
    // rule of T5/mT5 and the Llama-family data recipes: target share
    // p_s ∝ (tokens_s)^α with α < 1 flattening the natural distribution
    // toward uniform (α = 0.3 here, the mT5 setting), then the same
    // no-upsampling solve as `mix_rates` (T* = min_s tokens_s / p_s).
    // Contrast: mix_rates takes EXTERNALLY-given weights; this derives
    // them from the data's own mass. Same 100 TB shape — one corpus
    // aggregation, then |sources|-row arithmetic with two broadcast
    // scalars. pow() may differ in the last ulp across libms, so every
    // emitted float is rounded to 6 places (the cross-engine float
    // discipline BASELINE.md documents for order-divergent sums).
    "mix_temperature" -> ((s, dir) => {
      val tok = Tables(s, dir).documents
        .groupBy("source")
        .agg(sum(size(split(col("text"), " "))).cast("double").as("t"))
        .withColumn("w", pow(col("t"), lit(0.3)))
      val wsum = tok.agg(sum(col("w")).as("wsum"))
      val p = tok.crossJoin(broadcast(wsum))
        .withColumn("p", col("w") / col("wsum"))
      val tstar = p.agg(min(col("t") / col("p")).as("tstar"))
      p.crossJoin(broadcast(tstar))
        .select(
          col("source"),
          col("t").cast("long").as("n_tokens"),
          round(col("p"), 6).as("weight"),
          round(col("p") * col("tstar") / nullif(col("t"), lit(0.0)), 6).as("rate"),
          round(col("p") * col("tstar"), 2).as("sampled_tokens"))
        .orderBy("source")
    }),

    // per-source corpus statistics (doc count, token mass, mean length)
    "corpus_stats" -> ((s, dir) =>
      Tables(s, dir).documents
        .groupBy("source")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(size(split(col("text"), " "))).cast("long").as("total_tokens"))
        .withColumn("avg_tokens",
          col("total_tokens").cast("double") / col("n_docs"))
        .orderBy("source"))
  )

  def oracleSql: Map[String, String] = Map(
    "sample_hash" ->
      """SELECT doc_id, source,
        |  CAST(CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)),1,4) AS INTEGER) AS BIGINT) AS hb
        |FROM documents
        |WHERE CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)),1,4) AS INTEGER) < 6554
        |ORDER BY doc_id""".stripMargin,
    "split_train_test" ->
      """WITH h AS (
        |  SELECT source,
        |    CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)),1,4) AS INTEGER) AS hb
        |  FROM documents)
        |SELECT source,
        |  CASE WHEN hb < 58982 THEN 'train' WHEN hb < 62259 THEN 'val' ELSE 'test' END AS split,
        |  count(*) AS n
        |FROM h GROUP BY 1, 2 ORDER BY source, split""".stripMargin,
    "ngram_topk" ->
      """WITH words AS (
        |  SELECT DISTINCT doc_id, unnest(list_transform(range(1, len(string_split(text,' ')) - 1),
        |    i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1] || ' ' ||
        |         string_split(text,' ')[i+2])) AS w
        |  FROM documents WHERE len(string_split(text,' ')) >= 3)
        |SELECT w AS shingle, count(*) AS df FROM words
        |GROUP BY w ORDER BY df DESC, shingle LIMIT 20""".stripMargin,
    "seq_len_hist" ->
      """WITH n AS (
        |  SELECT source, len(string_split(text,' ')) AS n FROM documents)
        |SELECT source, CAST(n - n % 16 AS BIGINT) AS bin_lo, count(*) AS n_docs
        |FROM n GROUP BY 1, 2 ORDER BY source, bin_lo""".stripMargin,
    "mix_rates" ->
      """WITH tok AS (
        |  SELECT source,
        |    CAST(sum(len(string_split(text,' '))) AS DOUBLE) AS t,
        |    CAST(1 + CAST(substring(source, 4) AS INTEGER) % 4 AS DOUBLE) AS w
        |  FROM documents GROUP BY source),
        |p AS (SELECT source, t, w / (SELECT sum(w) FROM tok) AS p FROM tok),
        |ts AS (SELECT min(t / p) AS tstar FROM p)
        |SELECT source, CAST(t AS BIGINT) AS n_tokens,
        |  round(p, 6) AS weight,
        |  round(p * (SELECT tstar FROM ts) / nullif(t, 0), 6) AS rate,
        |  round(p * (SELECT tstar FROM ts), 2) AS sampled_tokens
        |FROM p ORDER BY source""".stripMargin,
    "mix_temperature" ->
      """WITH tok AS (
        |  SELECT source,
        |    CAST(sum(len(string_split(text,' '))) AS DOUBLE) AS t
        |  FROM documents GROUP BY source),
        |tw AS (SELECT source, t, pow(t, 0.3) AS w FROM tok),
        |p AS (SELECT source, t, w / (SELECT sum(w) FROM tw) AS p FROM tw),
        |ts AS (SELECT min(t / p) AS tstar FROM p)
        |SELECT source, CAST(t AS BIGINT) AS n_tokens,
        |  round(p, 6) AS weight,
        |  round(p * (SELECT tstar FROM ts) / nullif(t, 0), 6) AS rate,
        |  round(p * (SELECT tstar FROM ts), 2) AS sampled_tokens
        |FROM p ORDER BY source""".stripMargin,
    "corpus_stats" ->
      """SELECT source, count(*) AS n_docs,
        |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
        |  CAST(sum(len(string_split(text, ' '))) AS DOUBLE) / count(*) AS avg_tokens
        |FROM documents GROUP BY source ORDER BY source""".stripMargin
  )
}
