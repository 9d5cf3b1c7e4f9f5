package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Near-duplicate detection (SURVEY.md §2.12): MinHash + LSH banding,
  * word-set Jaccard verification, n-gram (3-word shingle) Jaccard, and
  * SimHash signatures — all as pure Spark expressions (no UDFs) with
  * engine-portable hashing (md5 hex strings) so every stage is mirrored
  * exactly by a DuckDB oracle.
  *
  * Scale design: the classic MinHash-LSH shape —
  *   doc → distinct tokens → K salted min-hashes → B bands → bucket join
  * Candidate generation is O(docs × B) rows and the join is a key-shuffle
  * on (band, band_sig); only bucket-colliding pairs reach the exact
  * Jaccard verifier, so there is no O(n²) all-pairs stage anywhere.
  * Min-hash aggregation gets map-side partial aggregation (min is
  * commutative), so the shuffle carries ≤ |docs|×K rows.
  */
object NearDedup {

  private val K = 8 // minhash functions (salts)
  private val BANDROWS = 2 // rows per band → B = K/BANDROWS = 4 bands

  /** doc_id → distinct words (the token-set view used by minhash+jaccard). */
  def words(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(array_distinct(split(col("text"), " "))).as("w"))

  /** Per-(doc, salt) minhash signature: min over md5(salt ':' word). */
  def minhash(words: DataFrame): DataFrame =
    words
      .withColumn("salt", explode(sequence(lit(0), lit(K - 1))))
      .groupBy(col("doc_id"), col("salt"))
      .agg(min(md5(concat(col("salt").cast("string"), lit(":"), col("w")))).as("sig"))

  /** LSH banding: concat the band's signatures in salt order. */
  def bands(minhash: DataFrame): DataFrame =
    minhash
      .withColumn("band", floor(col("salt") / BANDROWS).cast("long"))
      .groupBy(col("doc_id"), col("band"))
      .agg(
        array_join(
          transform(array_sort(collect_list(struct(col("salt"), col("sig")))),
            x => x.getField("sig")),
          ",").as("band_sig"))

  /** Candidate pairs = docs sharing any (band, band_sig) bucket. */
  def candidates(bands: DataFrame): DataFrame = {
    val a = bands.select(col("band"), col("band_sig"), col("doc_id").as("doc1"))
    val b = bands.select(col("band"), col("band_sig"), col("doc_id").as("doc2"))
    a.join(b, Seq("band", "band_sig"))
      .filter(col("doc1") < col("doc2"))
      .select("doc1", "doc2")
      .distinct()
  }

  /** Exact token-set Jaccard for the candidate pairs only. */
  def jaccard(cand: DataFrame, words: DataFrame): DataFrame = {
    val sizes = words.groupBy("doc_id").agg(count(lit(1)).as("nw"))
    val w1 = words.select(col("doc_id").as("doc1"), col("w"))
    val w2 = words.select(col("doc_id").as("doc2"), col("w"))
    val common = cand
      .join(w1, "doc1")
      .join(w2, Seq("doc2", "w"))
      .groupBy("doc1", "doc2")
      .agg(count(lit(1)).as("com"))
    common
      .join(sizes.select(col("doc_id").as("doc1"), col("nw").as("n1")), "doc1")
      .join(sizes.select(col("doc_id").as("doc2"), col("nw").as("n2")), "doc2")
      .withColumn("jacc", col("com").cast("double") / (col("n1") + col("n2") - col("com")))
  }

  /** 3-word shingles (n-gram view for shingle-level Jaccard). */
  def shingles(docs: DataFrame): DataFrame =
    docs
      .withColumn("ws", split(col("text"), " "))
      .filter(size(col("ws")) >= 3)
      .select(
        col("doc_id"),
        explode(array_distinct(transform(
          sequence(lit(1), size(col("ws")) - 2),
          i => concat_ws(" ",
            element_at(col("ws"), i),
            element_at(col("ws"), i + 1),
            element_at(col("ws"), i + 2))))).as("sh"))

  /** Portable 32-bit SimHash from md5(word): per bit position, sum ±1
    * votes over the document's distinct words; emit as a 32-char '0'/'1'
    * string (no engine-specific integer bit ops anywhere).
    */
  def simhash(words: DataFrame): DataFrame = {
    // ±1 vote for bit b of md5(w): hex digit → value via instr, → bit via
    // floor/pow/% only (integer-division semantics via explicit floor so
    // Spark and DuckDB agree; DuckDB CASTs double→int by rounding).
    val vote = expr(
      """(CAST(floor((instr('0123456789abcdef',
        |                   substring(md5(w), CAST(floor(b/4) AS INT)+1, 1)) - 1)
        |             / pow(2, 3 - b % 4)) AS BIGINT) % 2) * 2 - 1""".stripMargin)
    words
      .withColumn("b", explode(sequence(lit(0), lit(31))))
      .withColumn("vote", vote)
      .groupBy(col("doc_id"), col("b"))
      .agg(sum(col("vote")).as("v"))
      .groupBy(col("doc_id"))
      .agg(
        array_join(
          transform(array_sort(collect_list(struct(col("b"),
            when(col("v") > 0, "1").otherwise("0").as("bit")))),
            x => x.getField("bit")),
          "").as("sim_sig"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "dedup_near" -> ((s, dir) => {
      // minhash over 3-word shingles (shingle sets are far more
      // distinctive than word sets, keeping LSH buckets selective —
      // candidate count stays ~linear in |docs|, verified at sf0.1).
      val sh = shingles(Tables(s, dir).documents).withColumnRenamed("sh", "w")
      jaccard(candidates(bands(minhash(sh))), sh)
        .filter(col("jacc") >= 0.5)
        .select("doc1", "doc2", "n1", "n2", "com", "jacc")
        .orderBy("doc1", "doc2")
    }),

    "dedup_jaccard" -> ((s, dir) => {
      // shingle-level (3-gram) Jaccard over pairs sharing ≥1 shingle —
      // candidate generation via the shingle inverted index.
      val sh = shingles(Tables(s, dir).documents)
      val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("nw"))
      val s1 = sh.select(col("doc_id").as("doc1"), col("sh"))
      val s2 = sh.select(col("doc_id").as("doc2"), col("sh"))
      val common = s1.join(s2, "sh").filter(col("doc1") < col("doc2"))
        .groupBy("doc1", "doc2").agg(count(lit(1)).as("com"))
      common
        .join(sizes.select(col("doc_id").as("doc1"), col("nw").as("n1")), "doc1")
        .join(sizes.select(col("doc_id").as("doc2"), col("nw").as("n2")), "doc2")
        .withColumn("jacc", col("com").cast("double") / (col("n1") + col("n2") - col("com")))
        .filter(col("jacc") >= 0.5)
        .select("doc1", "doc2", "com", "jacc")
        .orderBy("doc1", "doc2")
    }),

    "dedup_simhash" -> ((s, dir) =>
      simhash(words(Tables(s, dir).documents)).orderBy("doc_id"))
  )

  def oracleSql: Map[String, String] = Map(
    "dedup_near" ->
      """WITH words AS (
        |  SELECT DISTINCT doc_id, unnest(list_transform(range(1, len(string_split(text,' ')) - 1),
        |    i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1] || ' ' ||
        |         string_split(text,' ')[i+2])) AS w
        |  FROM documents WHERE len(string_split(text,' ')) >= 3),
        |salted AS (
        |  SELECT doc_id, salt, min(md5(CAST(salt AS VARCHAR) || ':' || w)) AS sig
        |  FROM words CROSS JOIN (SELECT unnest(range(8)) AS salt) GROUP BY doc_id, salt),
        |bands AS (
        |  SELECT doc_id, CAST(floor(salt/2) AS BIGINT) AS band,
        |         string_agg(sig, ',' ORDER BY salt) AS band_sig
        |  FROM salted GROUP BY 1, 2),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS doc1, b.doc_id AS doc2 FROM bands a
        |  JOIN bands b ON a.band = b.band AND a.band_sig = b.band_sig AND a.doc_id < b.doc_id),
        |sizes AS (SELECT doc_id, count(*) AS nw FROM words GROUP BY doc_id),
        |common AS (
        |  SELECT c.doc1, c.doc2, count(*) AS com FROM cand c
        |  JOIN words w1 ON w1.doc_id = c.doc1
        |  JOIN words w2 ON w2.doc_id = c.doc2 AND w2.w = w1.w
        |  GROUP BY c.doc1, c.doc2)
        |SELECT doc1, doc2, s1.nw AS n1, s2.nw AS n2, com,
        |       CAST(com AS DOUBLE)/(s1.nw + s2.nw - com) AS jacc
        |FROM common JOIN sizes s1 ON s1.doc_id = doc1 JOIN sizes s2 ON s2.doc_id = doc2
        |WHERE CAST(com AS DOUBLE)/(s1.nw + s2.nw - com) >= 0.5
        |ORDER BY doc1, doc2""".stripMargin,
    "dedup_jaccard" ->
      """WITH sh AS (
        |  SELECT DISTINCT doc_id, unnest(list_transform(range(1, len(string_split(text,' ')) - 1),
        |    i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1] || ' ' ||
        |         string_split(text,' ')[i+2])) AS sh
        |  FROM documents WHERE len(string_split(text,' ')) >= 3),
        |sizes AS (SELECT doc_id, count(*) AS nw FROM sh GROUP BY doc_id),
        |common AS (
        |  SELECT a.doc_id AS doc1, b.doc_id AS doc2, count(*) AS com
        |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT doc1, doc2, com,
        |       CAST(com AS DOUBLE)/(s1.nw + s2.nw - com) AS jacc
        |FROM common JOIN sizes s1 ON s1.doc_id = doc1 JOIN sizes s2 ON s2.doc_id = doc2
        |WHERE CAST(com AS DOUBLE)/(s1.nw + s2.nw - com) >= 0.5
        |ORDER BY doc1, doc2""".stripMargin,
    "dedup_simhash" ->
      """WITH words AS (
        |  SELECT DISTINCT doc_id, unnest(string_split(text,' ')) AS w FROM documents),
        |bits AS (
        |  SELECT doc_id, b,
        |    (CAST(floor((strpos('0123456789abcdef', substring(md5(w), CAST(floor(b/4) AS INT)+1, 1)) - 1)
        |          / pow(2, 3 - b % 4)) AS BIGINT) % 2) * 2 - 1 AS vote
        |  FROM words CROSS JOIN (SELECT unnest(range(32)) AS b)),
        |votes AS (SELECT doc_id, b, sum(vote) AS v FROM bits GROUP BY doc_id, b)
        |SELECT doc_id, string_agg(CASE WHEN v > 0 THEN '1' ELSE '0' END, '' ORDER BY b) AS sim_sig
        |FROM votes GROUP BY doc_id ORDER BY doc_id""".stripMargin
  )
}
