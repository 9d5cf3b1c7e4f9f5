package graft.rel

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale techniques the 100 TB design point requires beyond what AQE
  * gives for free (SURVEY.md §4, builder prompt "salting for skew,
  * bucketing for co-located joins").
  */
object Scale {

  /** Skew-salted equi-join: fact keys with pathological frequency make
    * one shuffle partition a straggler in a plain key-shuffle join. The
    * fact side gets a deterministic salt in [0, salts); the (smaller)
    * build side is replicated `salts`× with every salt value; the join
    * key becomes (key, salt), spreading each hot key over `salts`
    * partitions. Semantically identical to `fact.join(dim, key)` for
    * unique-keyed `dim` (asserted in SkewSpec).
    *
    * AQE's skew-join split handles sort-merge cases adaptively; explicit
    * salting remains the tool when the skew is known and extreme, or the
    * join is hash-based.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String, salts: Int): DataFrame = {
    require(salts > 0, s"salts must be positive, got $salts " +
      "(pmod by 0 nulls every salt and sequence(0,-1) fabricates a -1 salt)")
    require(!fact.columns.contains("__salt") && !dim.columns.contains("__salt"),
      "inputs must not already have a __salt column — it would be " +
        "silently clobbered and dropped from the output")
    // salt derived from ROW CONTENT, never monotonically_increasing_id():
    // a nondeterministic salt re-assigns rows to different shuffle
    // partitions on task retry after a fetch failure — the SPARK-23207
    // class of silent duplicate/loss hazard on a real cluster. Fully
    // identical rows share a salt (acceptable: hot KEYS almost always
    // differ in their other fact columns).
    val saltedFact = fact.withColumn("__salt",
      pmod(xxhash64(fact.columns.map(col).toSeq: _*), lit(salts)).cast("int"))
    val replicatedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedFact
      .join(replicatedDim, Seq(key, "__salt"))
      .drop("__salt")
  }

  /** Register `df` as a bucketed, sorted table: joins/aggregations on the
    * bucket key between co-bucketed tables need NO exchange (verified at
    * plan level in BucketingSpec). This is the pre-shuffle-once,
    * join-many-times pattern for 100 TB fact tables.
    */
  def writeBucketed(
      df: DataFrame,
      table: String,
      bucketCol: String,
      buckets: Int
  ): Unit = {
    val spark = df.sparkSession
    // simple lowercase identifiers only: the stale-location cleanup below
    // derives the path as <warehouse>/<table>, which is wrong for
    // database-qualified names (<warehouse>/<db>.db/<table>) and for
    // mixed case (the catalog lower-cases) — reject rather than silently
    // no-op the cleanup for exactly the names it exists to handle
    require(table.matches("[a-z_][a-z0-9_]*"),
      s"writeBucketed needs a simple lowercase table name, got '$table'")
    spark.sql(s"DROP TABLE IF EXISTS $table")
    // the in-memory catalog forgets tables across sessions but their
    // warehouse directories survive — clear any stale location too
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir") + s"/$table")
    org.apache.hadoop.fs.FileSystem
      .get(loc.toUri, spark.sparkContext.hadoopConfiguration)
      .delete(loc, true)
    df.write
      .mode("overwrite")
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)
  }

  def bucketedJoin(spark: SparkSession, left: String, right: String, key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)

  /** Range-clustered layout: `repartitionByRange` + in-partition sort on
    * the clustering key before writing, so every output file covers a
    * narrow, disjoint key range. Parquet min/max statistics then let a
    * key-range filter skip whole files/row-groups at scan time — at
    * 100 TB this data layout is the single biggest scan-cost lever for
    * range-predicated access (time-range reads of a CDC log, id lookups)
    * and what Z-ordering generalizes for multi-column predicates.
    * Asserted in ScaleSpec: a clustered read touches 1 file where the
    * unclustered layout reads every file.
    */
  def writeRangeClustered(df: DataFrame, path: String, key: String, files: Int): Unit =
    df.repartitionByRange(files, col(key))
      .sortWithinPartitions(key)
      .write.mode("overwrite").parquet(path)

  /** Small-file compaction: rewrite a parquet directory into files of
    * ~`targetBytes` each, preserving rows exactly. Streaming sinks and
    * per-batch CDC writes accrete thousands of KB-sized files; at 100 TB
    * scan cost is then dominated by open/footer overhead and the
    * driver's file-listing memory, not bytes — periodic compaction is
    * the standard maintenance pass (what table formats call OPTIMIZE /
    * rewrite_data_files).
    *
    * The output file count is computed from the INPUT's total byte size
    * (driver-side filesystem metadata — a bounded listing, no data
    * collect): `ceil(bytes / targetBytes)`, floored at 1. The rewrite is
    * a single `repartition(n)` round-robin exchange — size-balanced
    * output files regardless of input skew. Pass `sortCol` to instead
    * range-cluster while compacting ([[writeRangeClustered]] semantics:
    * compaction is the natural moment to also fix layout, since the data
    * is being rewritten anyway).
    *
    * Compression-ratio caveat (documented, not solved): parquet bytes in
    * ≈ parquet bytes out only when encodings stay comparable — true for
    * a same-schema rewrite like this; a post-filter compaction would
    * need a sampled size estimate instead.
    */
  def compactFiles(
      spark: SparkSession,
      inputDir: String,
      outputDir: String,
      targetBytes: Long,
      sortCol: Option[String] = None
  ): Int = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    val in = new org.apache.hadoop.fs.Path(inputDir)
    val fs = org.apache.hadoop.fs.FileSystem
      .get(in.toUri, spark.sparkContext.hadoopConfiguration)
    val bytes = fs.getContentSummary(in).getLength
    val files = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    val df = spark.read.parquet(inputDir)
    val out = sortCol match {
      case Some(k) => df.repartitionByRange(files, col(k)).sortWithinPartitions(k)
      case None    => df.repartition(files)
    }
    out.write.mode("overwrite").parquet(outputDir)
    files
  }

  /** Morton (Z-order) interleave of two non-negative `bits`-wide codes:
    * bit i of `a` lands at position 2i, bit i of `b` at 2i+1. Built as a
    * fold of codegen-friendly bitwise ops — no UDF, stays inside
    * whole-stage codegen.
    */
  def mortonCode(a: Column, b: Column, bits: Int = 16): Column =
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }

  /** Z-order-clustered layout over TWO keys — the multi-column
    * generalization of [[writeRangeClustered]] (what table formats call
    * OPTIMIZE ZORDER BY): each output file covers a small axis-aligned
    * tile of the (keyA, keyB) space, so parquet min/max statistics skip
    * files for range predicates on EITHER key, where a single-key range
    * cluster only prunes on its own key (asserted in ScaleSpec). At
    * 100 TB this is the layout lever for fact tables probed by more than
    * one selective dimension (e.g. a CDC log read by time range AND by
    * key range).
    *
    * Keys are min/max-normalized to `bits`-wide codes before
    * interleaving; the min/max aggregation is one distributed pass whose
    * result is 4 scalars (driver-bounded by construction). Uniform-width
    * normalization keeps the per-row map stateless and fully codegen'd;
    * heavily skewed keys would want approx-quantile bin boundaries
    * instead (same interleave, different normalizer).
    */
  def writeZOrdered(df: DataFrame, path: String, keyA: String, keyB: String,
      files: Int, bits: Int = 16): Unit = {
    val r = df.agg(
      min(col(keyA)).cast("double"), max(col(keyA)).cast("double"),
      min(col(keyB)).cast("double"), max(col(keyB)).cast("double")).collect()(0)
    require(!r.anyNull, s"writeZOrdered: empty input or null keys ($keyA, $keyB)")
    val scale = (1L << bits) - 1
    def norm(c: String, lo: Double, hi: Double): Column = {
      val span = if (hi > lo) hi - lo else 1.0
      ((col(c).cast("double") - lit(lo)) * scale / span).cast("long")
    }
    val z = mortonCode(
      norm(keyA, r.getDouble(0), r.getDouble(1)),
      norm(keyB, r.getDouble(2), r.getDouble(3)), bits)
    df.withColumn("__z", z)
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }
}
