package graft.rel

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** Relational query surface (SURVEY.md §2.3–2.9) over the fixture star
  * schema, each query paired with a DuckDB oracle.
  *
  * Determinism rules (SURVEY.md §7.5), applied throughout:
  *  - money doubles are exact 2-decimal values → cast to DECIMAL(18,2)
  *    BEFORE summing, so aggregation is exact and order-independent in
  *    both engines; final CAST AS DOUBLE normalizes the output type.
  *  - every result carries a total ORDER BY on unique keys.
  *  - collect_list is always array_sort'ed.
  *
  * Scale notes: all queries are single-pass declarative plans — filters
  * and projections reach the parquet scan, aggregates get map-side
  * partials, the dimension sides of joins are broadcast explicitly where
  * we know they are small (nation/region/supplier), everything else is a
  * key-shuffle Catalyst can re-plan under AQE.
  */
object Queries {

  private def dec(c: String): org.apache.spark.sql.Column =
    col(c).cast(DecimalType(18, 2))

  /** Register fixture tables as temp views and run dialect-portable SQL
    * through Spark's own parser/analyzer — the identical text serves as
    * the DuckDB oracle, so what's under test is Catalyst's subquery
    * decorrelation, not a hand-built join equivalent.
    */
  private def sqlBoth(s: SparkSession, dir: String, sql: String): DataFrame = {
    val t = Tables(s, dir)
    Seq("customer", "orders", "supplier").foreach(n => t(n).createOrReplaceTempView(n))
    s.sql(sql)
  }

  private val subqScalarSql =
    """SELECT c_custkey, c_acctbal,
      |  (SELECT count(*) FROM orders o WHERE o.o_custkey = c.c_custkey) AS n_orders,
      |  (SELECT count(*) FROM orders) AS total_orders
      |FROM customer c ORDER BY c_custkey""".stripMargin

  private val subqInSql =
    """SELECT c_custkey, c_name FROM customer c
      |WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 200000)
      |  AND c_custkey NOT IN (SELECT s_suppkey FROM supplier)
      |ORDER BY c_custkey""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- §2.3 projections / filters --------------------------------
    "project" -> ((s, dir) =>
      Tables(s, dir).part.select(
        col("p_partkey"),
        upper(col("p_name")).as("name_up"),
        concat(col("p_brand"), lit("/"), col("p_type")).as("brand_type"),
        (col("p_size") + 1).as("size1"),
        col("p_retailprice")
      ).orderBy("p_partkey")),

    "filter_eq" -> ((s, dir) =>
      Tables(s, dir).orders
        .filter(col("o_orderstatus") === "O")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy("o_orderkey")),

    "filter_range" -> ((s, dir) =>
      Tables(s, dir).lineitem
        .filter(
          col("l_shipdate") >= lit("1996-01-01").cast("timestamp_ntz") &&
            col("l_shipdate") < lit("1997-01-01").cast("timestamp_ntz") &&
            col("l_quantity").between(10, 20))
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_shipdate")
        .orderBy("l_orderkey", "l_linenumber")),

    "filter_like" -> ((s, dir) =>
      Tables(s, dir).part
        .filter(col("p_name").like("%gear%") || col("p_name").like("small%"))
        .select("p_partkey", "p_name")
        .orderBy("p_partkey")),

    "filter_in" -> ((s, dir) =>
      Tables(s, dir).customer
        .filter(col("c_mktsegment").isin("BUILDING", "AUTOMOBILE"))
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")),

    "filter_null" -> ((s, dir) =>
      Tables(s, dir).orders
        .withColumn("st", expr("nullif(o_orderstatus, 'P')"))
        .filter(col("st").isNull)
        .select("o_orderkey", "st")
        .orderBy("o_orderkey")),

    // ---- §2.4 joins -------------------------------------------------
    "join_broadcast" -> ((s, dir) => {
      val t = Tables(s, dir)
      t.nation
        .join(broadcast(t.region), col("n_regionkey") === col("r_regionkey"))
        .select("n_nationkey", "n_name", "r_name")
        .orderBy("n_nationkey")
    }),

    "join_smj" -> ((s, dir) => {
      val t = Tables(s, dir)
      // hint("merge"): exercise the shuffle sort-merge path even at test
      // scale (at 100 TB neither side broadcasts and SMJ is the plan).
      t.orders.hint("merge")
        .join(t.lineitem, col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderkey", "o_totalprice")
        .agg(
          count(lit(1)).as("n_items"),
          sum(col("l_quantity")).as("sum_qty"),
          sum(dec("l_extendedprice") * (lit(1) - dec("l_discount")))
            .cast("double").as("revenue"))
        .orderBy("o_orderkey")
    }),

    "join_star" -> ((s, dir) => {
      val t = Tables(s, dir)
      t.lineitem
        .join(t.orders.hint("merge"), col("l_orderkey") === col("o_orderkey"))
        .join(t.customer, col("o_custkey") === col("c_custkey"))
        .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t.region), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name", "n_name", "c_mktsegment")
        .agg(
          count(lit(1)).as("n_items"),
          sum(dec("l_extendedprice") * (lit(1) - dec("l_discount")))
            .cast("double").as("revenue"))
        .orderBy("r_name", "n_name", "c_mktsegment")
    }),

    "join_outer" -> ((s, dir) => {
      val t = Tables(s, dir)
      t.customer
        .join(t.orders, col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(
          count(col("o_orderkey")).as("n_orders"),
          sum(dec("o_totalprice")).cast("double").as("total_spend"))
        .orderBy("c_custkey")
    }),

    "join_semi" -> ((s, dir) => {
      val t = Tables(s, dir)
      t.customer
        .join(t.orders, col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    }),

    "join_anti" -> ((s, dir) => {
      val t = Tables(s, dir)
      t.customer
        .join(t.orders, col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    }),

    "join_cross" -> ((s, dir) => {
      val t = Tables(s, dir)
      val a = t.region.select(col("r_name").as("a"))
      val b = t.region.select(col("r_name").as("b"))
      a.crossJoin(b).orderBy("a", "b")
    }),

    "join_range" -> ((s, dir) => {
      val t = Tables(s, dir)
      // equi on nation + range on acctbal: key-shuffle join with a
      // residual range predicate (no cartesian blowup at scale).
      t.supplier.alias("s")
        .join(
          t.customer.alias("c"),
          col("s.s_nationkey") === col("c.c_nationkey") &&
            col("c.c_acctbal").between(col("s.s_acctbal") - 10, col("s.s_acctbal") + 10))
        .select(col("s_suppkey"), col("c_custkey"), col("s_acctbal"), col("c_acctbal"))
        .orderBy("s_suppkey", "c_custkey")
    }),

    // ---- §2.5 aggregations -----------------------------------------
    "agg_count" -> ((s, dir) =>
      Tables(s, dir).lineitem
        .agg(count(lit(1)).as("n_rows"), count(col("l_quantity")).as("n_qty"))),

    "q1_agg" -> ((s, dir) =>
      Tables(s, dir).lineitem
        .filter(col("l_shipdate") <= lit("2000-12-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          sum(dec("l_extendedprice")).cast("double").as("sum_base"),
          sum(dec("l_extendedprice") * (lit(1) - dec("l_discount")))
            .cast("double").as("sum_disc"),
          (sum(dec("l_discount")).cast("double") / count(lit(1))).as("avg_disc"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag", "l_linestatus")),

    "agg_group" -> ((s, dir) =>
      Tables(s, dir).customer
        .groupBy("c_mktsegment")
        .agg(
          count(lit(1)).as("n"),
          sum(dec("c_acctbal")).cast("double").as("sum_bal"),
          min(col("c_acctbal")).as("min_bal"),
          max(col("c_acctbal")).as("max_bal"))
        .orderBy("c_mktsegment")),

    "agg_distinct" -> ((s, dir) =>
      Tables(s, dir).lineitem
        .groupBy("l_returnflag")
        .agg(
          countDistinct(col("l_suppkey")).as("n_supp"),
          countDistinct(col("l_partkey")).as("n_part"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag")),

    // Count-Min heavy-hitters report (oracle-checked like agg_approx:
    // the grid's portable md5 cell hash makes the whole sketch
    // DuckDB-replayable). The production artifact at 100 TB
    // is the SKETCH: a constant ~32 KB mergeable buffer per map partial
    // (functions/CountMin — a linear sketch, so Aggregator.merge is
    // cell-wise add and Spark's partial-agg machinery is the scale
    // path), where the exact groupBy it is graded against must shuffle
    // every distinct key. The exact side here plays the ApproxSpec role
    // in-query: `within_bound` checks the CM error envelope (never an
    // underestimate; overestimate ≤ 4·⌈e·N/width⌉). The textbook
    // ⌈e·N/width⌉ bound is PROBABILISTIC — it holds per key only with
    // p ≥ 1 − e⁻ᴰᵉᵖᵗʰ (~98.2% at Depth=4), so on arbitrary data a
    // healthy sketch could legitimately flip it. The 4× widening makes
    // a false flip effectively impossible: per depth-row Markov gives
    // P(excess ≥ 4e·N/w) ≤ 1/(4e), the row-minimum taken over Depth=4
    // independent rows drives that to (4e)⁻⁴ ≈ 7·10⁻⁵ per key, and the
    // union bound over the 10 reported keys keeps the whole column
    // honest at < 10⁻³ — so a flipped row still means a sketch
    // regression, not sampling noise. The grid probe is a
    // Scala UDF for the same documented reason as the Bloom probe
    // (Curation.scala): no public built-in evaluates a CM grid against a
    // column — and it runs on the post-aggregation key table (cardinality
    // rows), never the event scan.
    "agg_heavyhitters" -> ((s, dir) => {
      val ev = Tables(s, dir).events
      val gridRow = ev.agg(
        graft.functions.CountMin.count_min(col("user_id")).as("__grid"),
        count(lit(1)).as("__n"))
      val est = udf((grid: Seq[Long], key: Long) =>
        graft.functions.CountMin.estimate(grid.toArray, key))
      // top-10 FIRST via orderBy+limit → TakeOrderedAndProject (the
      // distributed top-k physical op, per-partition heaps — never a
      // single-task full-cardinality window sort), so the grid probe
      // and the bound arithmetic run on exactly 10 rows; the rank
      // window after the cut orders a 10-row table (trivial by
      // construction).
      val top = ev.groupBy("user_id").agg(count(lit(1)).as("exact_n"))
        .orderBy(col("exact_n").desc, col("user_id")).limit(10)
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("exact_n").desc, col("user_id"))
      top.join(broadcast(gridRow))
        .withColumn("est_n", est(col("__grid"), col("user_id")))
        .withColumn("rank", row_number().over(w).cast("long"))
        .withColumn("within_bound",
          col("est_n") >= col("exact_n") &&
            col("est_n") <= col("exact_n") +
              lit(4) * ceil(col("__n") * 2.718281828 / graft.functions.CountMin.Width))
        .select("rank", "user_id", "exact_n", "est_n", "within_bound")
        .orderBy("rank")
    }),

    // Approximate COUNT DISTINCT as a PORTABLE HyperLogLog (SURVEY
    // §2.5), graduated from rows-only the same way agg_heavyhitters
    // was: the sketch's hash is the engine's one portable idiom (md5
    // hex prefix, the Sampling.hashBucket contract), so the DuckDB
    // oracle rebuilds every register from the raw column and the
    // ENTIRE sketch state is value-checked (reg_digest = md5 of the
    // sorted register list; s = the exact integer register sum scaled
    // by 2^45; raw_est = the Flajolet alpha·m²/ΣΣ2⁻ᴹ estimator as ONE
    // double division of constant-folded IEEE terms, round-6). m=64
    // registers (p=6) keeps the raw estimator in its valid regime
    // (n ≥ 2.5·m = 160) at every fixture SF — the smallest cardinality
    // checked is 200 — so no ln()-based linear-counting branch is
    // needed in the compared output. within_tol pins |est−exact| ≤
    // 3σ = 3·1.04/√64 = 39%.
    //
    // Scale shape: rho is computed per row inside the scan, then
    // groupBy(col,bucket).max — map-side combine reduces every
    // partition to ≤64 rows per column BEFORE the exchange, which is
    // exactly how a distributed HLL merge works (register-wise max is
    // the sketch union). The exact_n side is the standard 2-level
    // distinct. At 100 TB the cheaper-per-row builtin
    // approx_count_distinct is the production call — ApproxSpec pins
    // it against the exact count — while this portable twin is the
    // differentially-verifiable form (md5 ~10× xxhash per row, same
    // adjudication as agg_heavyhitters' grid hash).
    "agg_approx" -> ((s, dir) => {
      val li = Tables(s, dir).lineitem
      val vals = li.select(lit("part").as("col_name"),
          col("l_partkey").cast("long").as("v"))
        .unionByName(li.select(lit("order").as("col_name"),
          col("l_orderkey").cast("long").as("v")))
      // r19 note (measured, REJECTED): spreading the hashing branch
      // (Engine.spread before the md5 projection — the §2.5 input-skew
      // move for the single-row-group fixture) measured FLAT at sf0.1
      // in both the all-branches and hash-branch-only forms: the scan
      // task's serialization of 1.2M shuffle rows costs what the
      // parallel md5 saves, and at scale the extra full-row exchange is
      // strictly worse than the scan-split parallelism a cluster already
      // has. Kept as the plain map-side-combine shape.
      val h = md5(concat(lit("hll:"), col("v").cast("string")))
      // b: 6-bit register index from the first hex byte; rest: the next
      // 44 bits; rho: 1 + leading zeros of rest in a 44-bit field
      // (= 45 − bitlength), the HLL rank — all integer, so the oracle
      // mirrors it with the same substr/bin arithmetic.
      val hashed = vals.select(col("col_name"),
        (conv(substring(h, 1, 2), 16, 10).cast("long") % 64).as("b"),
        conv(substring(h, 3, 11), 16, 10).cast("long").as("rest"))
      val regs = hashed
        .select(col("col_name"), col("b"),
          when(col("rest") === 0L, lit(45L))
            .otherwise(lit(45L) - length(bin(col("rest"))).cast("long")).as("r"))
        .groupBy("col_name", "b").agg(max("r").as("mr"))
      val summary = regs.groupBy("col_name").agg(
        (lit(64L) - count(lit(1))).as("v_zero"),
        (expr("sum(shiftleft(CAST(1 AS BIGINT), CAST(45 - mr AS INT)))") +
          (lit(64L) - count(lit(1))) * lit(35184372088832L)).as("s"),
        expr("md5(array_join(transform(array_sort(collect_list(struct(b, mr)))," +
          " x -> concat(x.b, ':', x.mr)), ','))").as("reg_digest"))
      val exact = vals.groupBy("col_name")
        .agg(countDistinct(col("v")).as("exact_n"))
      val est = round(
        (lit(0.7213) / (lit(1.0) + lit(1.079) / lit(64.0)) * lit(64.0) *
          lit(64.0) * lit(35184372088832.0)) / col("s").cast("double"), 6)
      exact.join(summary, "col_name")
        .select(col("col_name"), col("exact_n"), col("v_zero"), col("s"),
          col("reg_digest"), est.as("raw_est"),
          (abs(est - col("exact_n").cast("double")) <=
            lit(0.39) * col("exact_n").cast("double")).as("within_tol"))
        .orderBy("col_name")
    }),

    "agg_rollup" -> ((s, dir) =>
      Tables(s, dir).orders
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(
          count(lit(1)).as("n"),
          sum(dec("o_totalprice")).cast("double").as("sum_price"))
        .select(
          coalesce(col("o_orderstatus"), lit("ALL")).as("st"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("pri"),
          col("n"), col("sum_price"))
        .orderBy("st", "pri")),

    "agg_cube" -> ((s, dir) =>
      Tables(s, dir).lineitem
        .cube("l_returnflag", "l_linestatus")
        .agg(sum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
          col("sum_qty"), col("n"))
        .orderBy("rf", "ls")),

    "agg_gsets" -> ((s, dir) => {
      // explicit GROUPING SETS (beyond rollup/cube): per-status totals,
      // per-priority totals, and the grand total in one pass.
      Tables(s, dir).orders.createOrReplaceTempView("orders_v")
      s.sql(
        """SELECT coalesce(o_orderstatus,'ALL') AS st,
          |       coalesce(o_orderpriority,'ALL') AS pri,
          |       count(*) AS n
          |FROM orders_v
          |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
          |ORDER BY st, pri""".stripMargin)
    }),

    "agg_pivot" -> ((s, dir) =>
      Tables(s, dir).orders
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", Seq("O", "F", "P"))
        .agg(count(lit(1)))
        .select(
          col("o_orderpriority"),
          coalesce(col("O"), lit(0L)).as("n_o"),
          coalesce(col("F"), lit(0L)).as("n_f"),
          coalesce(col("P"), lit(0L)).as("n_p"))
        .orderBy("o_orderpriority")),

    // wide→long reshape: unpivot the pivoted counts back to rows (the
    // melt operation feature pipelines use constantly); zero-count
    // combinations survive the roundtrip
    "agg_unpivot" -> ((s, dir) => {
      val piv = Tables(s, dir).orders
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .select(
          col("o_orderpriority"),
          coalesce(col("F"), lit(0L)).as("F"),
          coalesce(col("O"), lit(0L)).as("O"),
          coalesce(col("P"), lit(0L)).as("P"))
      piv.unpivot(
          Array(col("o_orderpriority")),
          Array(col("F"), col("O"), col("P")),
          "status", "n")
        .orderBy("o_orderpriority", "status")
    }),

    "fn_bitwise" -> ((s, dir) =>
      Tables(s, dir).orders.select(
        col("o_orderkey"),
        col("o_orderkey").bitwiseAND(lit(255L)).as("and255"),
        col("o_orderkey").bitwiseOR(lit(16L)).as("or16"),
        col("o_orderkey").bitwiseXOR(lit(85L)).as("xor85"),
        shiftleft(col("o_orderkey"), 2).as("shl2"),
        shiftright(col("o_orderkey"), 3).as("shr3")
      ).orderBy("o_orderkey")),

    // exact percentiles (sort-based, linear interpolation) — both
    // engines implement the same continuous-quantile definition, so the
    // result is hash-exact despite being "statistical". Scale note:
    // exact percentile concentrates each group's values in one task
    // (3 groups → 3 working cores regardless of cluster size); at 100 TB
    // the right operator is approx_percentile (t-digest — mergeable
    // map-side sketches, error-bounded). Exact is kept HERE because the
    // oracle needs bit-equality; the swap is one function name.
    "agg_percentile" -> ((s, dir) =>
      // both quantity percentiles ride ONE aggregation buffer (array
      // argument) instead of two independent counts-maps over the same
      // 600k values — measured ~0.2 s off this id at sf0.1 (the per-row
      // map update, not the buffer merge, dominates); the price
      // percentile needs its own buffer (different column)
      // r19 note (measured, REJECTED — the second rejection after r18's
      // merged-branch attempt on agg_approx_pct): spreading the scan by
      // l_orderkey to parallelize the partial Percentile buffers
      // measured 1.26 -> ~1.5-1.8 s at sf0.1. The price buffer's FINAL
      // merge re-inserts every partial map's (value, count) entry into
      // one per-group map — the same single-threaded work the per-row
      // update path already did — so the spread only added a 600k-row
      // exchange. The exact form stays as-is; approx_percentile remains
      // the documented 100 TB swap.
      Tables(s, dir).lineitem
        .groupBy("l_returnflag")
        .agg(
          percentile(col("l_quantity"), array(lit(0.5), lit(0.9))).as("qty_p"),
          percentile(col("l_extendedprice"), lit(0.5)).as("price_p50"))
        .select(col("l_returnflag"),
          element_at(col("qty_p"), 1).as("qty_p50"),
          element_at(col("qty_p"), 2).as("qty_p90"),
          col("price_p50"))
        .orderBy("l_returnflag")),

    // boolean/conditional aggregates
    "agg_bool" -> ((s, dir) =>
      Tables(s, dir).orders
        .groupBy("o_orderpriority")
        .agg(
          count_if(col("o_totalprice") > 100000).as("n_big"),
          bool_and(col("o_totalprice") > 0).as("all_pos"),
          bool_or(col("o_totalprice") > 400000).as("any_huge"))
        .orderBy("o_orderpriority")),

    // statistical moments + correlation. Merge order of the partial
    // aggregates makes the LOW bits run-dependent; rounding to 6 decimals
    // (orders of magnitude above the ~1e-10 merge noise) makes the result
    // hash-stable, so this IS oracle-checked — the oracle SQL rounds
    // identically. Unrounded values are asserted against closed-form
    // two-pass computations (with tolerance) in ApproxSpec
    "agg_stats" -> ((s, dir) =>
      Tables(s, dir).lineitem
        .groupBy("l_returnflag")
        .agg(
          round(stddev_samp(col("l_quantity")), 6).as("qty_sd"),
          round(var_samp(col("l_quantity")), 6).as("qty_var"),
          round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("qty_price_corr"),
          round(covar_samp(col("l_quantity"), col("l_extendedprice")), 6).as("qty_price_cov"))
        .orderBy("l_returnflag")),

    // the 100 TB percentile path (see agg_percentile): mergeable
    // error-bounded sketches with map-side partials. Sketch internals are
    // engine-specific → rows-only for the driver; accuracy vs the exact
    // sort-based form is asserted in ApproxSpec, AND the query itself
    // carries a deterministic `within_tol` verdict: the working sketch
    // (accuracy 1000) against a 10× tighter sketch (accuracy 10000) of
    // the same column in the same pass. Sketch-vs-tight-sketch, not
    // vs exact percentile: the exact form materializes every group's
    // values (it IS agg_percentile's whole cost) where the tighter
    // digest stays a bounded-memory partial aggregate — and a sketch
    // regression still flips the verdict in the dumped parquet.
    // Approximate percentiles as a PORTABLE deterministic-sample sketch
    // (graduated from rows-only the same way agg_approx/agg_heavyhitters
    // were — swap the engine-opaque summary for the house portable-hash
    // idiom and the whole computation becomes DuckDB-replayable): the
    // sample is the ~6.5% of rows whose md5("pct:"+rowkey) 16-bit
    // bucket < 4260 (hash-deterministic, any partitioning — never
    // rand()), the estimate is the EXACT interpolated percentile of
    // that sample (the agg_percentile parity idiom), and `within_tol`
    // audits it against the full-data percentile at 10% (≫3σ of the
    // uniform-sample rank error at the smallest fixture group).
    // Uniform-sample quantile estimation is the textbook scale path
    // when a mergeable summary isn't available: at 100 TB only the
    // sample side runs (filter pushed into the scan cuts the sort
    // buffer 15×) — the exact side here is the in-query audit, same
    // role as agg_heavyhitters' exact column. Spark's builtin
    // approx_percentile (GK summaries) stays pinned against the exact
    // form in ApproxSpec as the cheaper mergeable-summary production
    // call whose internals no other engine can replay.
    "agg_approx_pct" -> ((s, dir) => {
      val li = Tables(s, dir).lineitem
      val hb = conv(substring(md5(concat(lit("pct:"),
          col("l_orderkey").cast("string"), lit(":"),
          col("l_linenumber").cast("string"))), 1, 4), 16, 10).cast("long")
      // r18-opt note (measured, REJECTED): merging the sample and exact
      // sides into one aggregate (percentile over `when(in_s, c)` — one
      // scan, one agg, no join) looked like the guide §2.4 win but
      // measured 1.47 s → 2.3–3.1 s in the same QTime window. Two
      // reasons: the exact Percentile buffer's per-row update path
      // beats its partial-buffer MERGE path (merging 32 ~200k-entry
      // counts-maps per group is the same single-threaded work the
      // per-row path already did), and the two independent branches of
      // the join form run as CONCURRENT stages — the plan-level
      // parallelism the merged form forfeits. Kept as the two-branch
      // join by measurement.
      val sample = li.filter(hb < 4260L)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n_sample"),
          percentile(col("l_quantity"), lit(0.5)).as("qp50"),
          percentile(col("l_extendedprice"), lit(0.9)).as("pp90"))
      val exact = li.groupBy("l_returnflag")
        .agg(percentile(col("l_quantity"), lit(0.5)).as("xq"),
          percentile(col("l_extendedprice"), lit(0.9)).as("xp"))
      sample.join(exact, "l_returnflag")
        .select(col("l_returnflag"), col("n_sample"),
          round(col("qp50"), 6).as("qty_p50"),
          round(col("pp90"), 6).as("price_p90"),
          (abs(col("qp50") - col("xq")) <= abs(col("xq")) * 0.10 &&
           abs(col("pp90") - col("xp")) <= abs(col("xp")) * 0.10)
            .as("within_tol"))
        .orderBy("l_returnflag")
    }),

    // map-typed column surface: construct, look up, reshape — outputs
    // projected to scalars so the driver compare stays portable
    "fn_map" -> ((s, dir) =>
      Tables(s, dir).part
        .withColumn("m", map(
          lit("brand"), col("p_brand"),
          lit("type"), col("p_type")))
        .select(
          col("p_partkey"),
          element_at(col("m"), "brand").as("brand"),
          element_at(col("m"), "type").as("type_"),
          size(col("m")).cast("long").as("m_size"),
          array_join(map_keys(col("m")), ",").as("keys"))
        .orderBy("p_partkey")),

    "agg_collect" -> ((s, dir) => {
      val t = Tables(s, dir)
      t.nation
        .join(broadcast(t.region), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name")
        .agg(
          // canonical string at the query boundary: the driver's pandas
          // compare cannot sort list columns (round-1 verdict item 1)
          array_join(array_sort(collect_list(col("n_name"))), ",").as("nations"),
          count(lit(1)).as("n"))
        .orderBy("r_name")
    }),

    // ---- §2.6 window functions -------------------------------------
    "win_dist" -> ((s, dir) => {
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("c_acctbal"), col("c_custkey"))
      Tables(s, dir).customer
        .select(
          col("c_mktsegment"), col("c_custkey"), col("c_acctbal"),
          ntile(4).over(w).cast("long").as("quartile"),
          percent_rank().over(w).as("pr"),
          cume_dist().over(w).as("cd"))
        .orderBy("c_mktsegment", "c_custkey")
    }),

    "win_rownum" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("event_id").desc)
      Tables(s, dir).events
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 3)
        .select("user_id", "event_id", "event_type", "rn")
        .orderBy("user_id", "rn")
    }),

    "win_rank" -> ((s, dir) => {
      val w = Window.partitionBy(col("c_mktsegment")).orderBy(col("c_acctbal").desc)
      Tables(s, dir).customer
        .withColumn("rk", rank().over(w).cast("long"))
        .filter(col("rk") <= 5)
        .select("c_mktsegment", "c_custkey", "c_acctbal", "rk")
        .orderBy("c_mktsegment", "rk", "c_custkey")
    }),

    "win_lag" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      Tables(s, dir).events
        .withColumn("prev_value", lag(col("value"), 1).over(w))
        .withColumn("delta", col("value") - col("prev_value"))
        .select("user_id", "event_id", "value", "prev_value", "delta")
        .orderBy("user_id", "event_id")
    }),

    "win_running" -> ((s, dir) => {
      // order key carries l_partkey: (orderkey, linenumber) is NOT
      // unique in the fixtures (457k distinct over 600k rows at sf0.1),
      // and a ROWS frame over a tied order is engine-order-dependent —
      // the sf0.01 check passed only because no tie landed in one
      // partition there. (l_suppkey, shipdate, orderkey, linenumber,
      // partkey) is verified unique at both scales.
      val w = Window
        .partitionBy(col("l_suppkey"))
        .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"),
          col("l_partkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      // l_partkey also travels to the output and the trailing sort: the
      // window ORDER is total only WITH it, so the dumped parquet's row
      // order must key on it too — otherwise rows tied on the first four
      // keys (with different run_qty) land in either order.
      Tables(s, dir).lineitem
        .withColumn("run_qty", sum(col("l_quantity")).over(w))
        .select("l_suppkey", "l_orderkey", "l_linenumber", "l_partkey",
          "l_shipdate", "run_qty")
        .orderBy("l_suppkey", "l_shipdate", "l_orderkey", "l_linenumber",
          "l_partkey")
    }),

    // Funnel / event-sequence detection (view → click → purchase, in
    // order, per user): the classic product-analytics operator. NO
    // self-join — each stage is a cumulative min over the user's
    // time-ordered history (strictly-preceding frame), so a row knows
    // whether the prior stage already happened; the two Window nodes
    // share one partitioning → ONE shuffle total, O(n) per user. Ties
    // broken by event_id for run-to-run determinism.
    "funnel" -> ((s, dir) => {
      val w = Window
        .partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      Tables(s, dir).events
        .withColumn("view_before",
          min(when(col("event_type") === "view", col("ts"))).over(w))
        .withColumn("qual_click_ts",
          when(col("event_type") === "click" && col("view_before").isNotNull, col("ts")))
        .withColumn("click_before", min(col("qual_click_ts")).over(w))
        .agg(
          countDistinct(when(col("event_type") === "view", col("user_id")))
            .as("n_view_users"),
          countDistinct(when(col("qual_click_ts").isNotNull, col("user_id")))
            .as("n_click_users"),
          countDistinct(when(col("event_type") === "purchase" &&
            col("click_before").isNotNull, col("user_id")))
            .as("n_purchase_users"))
    }),

    // Gap-based sessionization (batch twin of the streaming session
    // window, but emitting a session SEQUENCE per event — what funnels
    // and per-session aggs join on): a session break is a >30 min gap
    // from the previous event; the session id is the cumulative count
    // of breaks. Two stacked windows over ONE partitioning (lag, then
    // running sum) → one shuffle, O(n) per user.
    "sessionize" -> ((s, dir) => {
      val byTs = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val cum = byTs.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables(s, dir).events
        .withColumn("prev_ms", lag(unix_millis(col("ts").cast("timestamp")), 1).over(byTs))
        .withColumn("brk",
          when(col("prev_ms").isNull ||
            unix_millis(col("ts").cast("timestamp")) - col("prev_ms") > 1800000L, 1L)
            .otherwise(0L))
        .withColumn("session_seq", sum(col("brk")).over(cum))
        .select("user_id", "event_id", "session_seq")
        .orderBy("user_id", "event_id")
    }),

    // Interval-overlap join (SURVEY §2.4 family extension): per-session
    // concurrency — for every gap-based user session, how many OTHER
    // users' sessions overlap it in time. The naive form is an O(n²)
    // theta self-join (a.st ≤ b.en AND b.st ≤ a.en); the scalable form
    // here is the canonical BIN-BUCKETED interval join: each interval
    // explodes into the 2²⁰ ms (~17.5 min) time bins it covers —
    // sequence(st>>20, en>>20), ~1–5 bins per session — and candidates
    // meet through a plain shuffled EQUI-join on the bin, with the true
    // overlap predicate as a residual filter. Each overlapping pair is
    // counted exactly once via the overlap-START bin: bin ==
    // (max(a.st,b.st))>>20, a bin both intervals necessarily cover.
    // At 100 TB this is the difference between an unplannable cross
    // product and a shuffle keyed on ~|span/bin| buckets whose per-bin
    // candidate sets stay bounded by interval density — the bin width
    // is the knob (≈ typical interval length; too wide → fat buckets,
    // too narrow → replication ∝ length/bin). Zero-overlap sessions
    // are kept through a final left join (count 0).
    "join_interval" -> ((s, dir) => {
      val byTs = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val cum = byTs.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      // r19 (replaces the r18 localCheckpoint — VERDICT r18 flagged it:
      // the session table is corpus-scale, and localCheckpoint stores
      // non-replicated executor-local blocks AND truncates lineage, so
      // an executor loss at 100 TB is unrecoverable). The r18 third
      // reference (zero-overlap restore) is GONE structurally: every
      // session meets at least ITSELF in each bin it covers, so the
      // inner self-join preserves all sessions and the overlap count is
      // a conditional count over the joined rows (same pairs — the
      // start-bin rule still counts each overlapping pair exactly once;
      // self/same-user rows fail the a.user != b.user conjunct, exactly
      // as before). The remaining two references are the self-join
      // sides, kept canonically identical (same columns, same order) so
      // exchange reuse CAN dedup them; today's AQE does not, and the
      // two evaluations of the cheap sessionization subtree run as
      // concurrent stages — measured flat vs the materialized form at
      // sf0.1 — with full lineage kept and zero non-replicated state.
      val binned = Tables(s, dir).events
        .withColumn("ms", unix_millis(col("ts").cast("timestamp")))
        .withColumn("prev_ms", lag(col("ms"), 1).over(byTs))
        .withColumn("brk",
          when(col("prev_ms").isNull || col("ms") - col("prev_ms") > 1800000L, 1L)
            .otherwise(0L))
        .withColumn("seq", sum(col("brk")).over(cum))
        .groupBy("user_id", "seq")
        .agg(min(col("ms")).as("st"), max(col("ms")).as("en"))
        .withColumn("bin",
          explode(sequence(shiftright(col("st"), 20), shiftright(col("en"), 20))))
      // Both join sides project the SAME columns in the same order (only
      // names differ — canonicalization erases names), so the two
      // sort-merge exchanges canonicalize identically and AQE reuses one
      // shuffle stage for both: the sessionization runs once. The merge
      // hint blocks the planner's broadcast pick, which would both
      // re-evaluate the subtree for the build side and be the wrong call
      // at 100 TB (the session table is corpus-scale).
      val a = binned.select(col("user_id").as("a_user"), col("seq").as("a_seq"),
        col("st").as("a_st"), col("en").as("a_en"), col("bin").as("a_bin"))
      val b = binned.select(col("user_id").as("b_user"), col("seq").as("b_seq"),
        col("st").as("b_st"), col("en").as("b_en"), col("bin").as("b_bin"))
      a.join(b.hint("merge"), col("a_bin") === col("b_bin"))
        .groupBy(col("a_user").as("user_id"), col("a_seq").as("session_seq"))
        .agg(count(when(
          col("a_user") =!= col("b_user") &&
            col("a_st") <= col("b_en") && col("b_st") <= col("a_en") &&
            col("a_bin") === shiftright(greatest(col("a_st"), col("b_st")), 20),
          lit(1))).as("n_concurrent"))
        .orderBy("user_id", "session_seq")
    }),

    // Weekly retention cohorts: users grouped by their first-activity
    // week; each (cohort, week-offset) cell counts distinct users still
    // active that week. One window (per-user first week) + one
    // aggregation — the standard retention matrix without any self-join.
    "cohort" -> ((s, dir) => {
      val wk = date_trunc("week", col("ts"))
      val firstWk = min(wk).over(Window.partitionBy(col("user_id")))
      Tables(s, dir).events
        .withColumn("cohort_week", firstWk)
        .withColumn("week_offset",
          (datediff(wk.cast("date"), col("cohort_week").cast("date")) / 7).cast("long"))
        .groupBy("cohort_week", "week_offset")
        .agg(countDistinct(col("user_id")).as("n_active"))
        .orderBy("cohort_week", "week_offset")
    }),

    // time-series OHLC downsampling (round 15 cont.) — the resample
    // every metrics/market pipeline runs: per hourly bar, first/max/
    // min/last of the value plus count and volume. open/close use
    // min_by/max_by on a UNIQUE composite key (ms·2²² + event_id — ids
    // stay far under 2²² in every fixture and ms·2²² < 2⁶³ through
    // 2036; ts alone can tie), so
    // the bar is deterministic cross-engine and the whole id is ONE
    // map-side-combinable aggregate — arg-min/max partials merge like
    // any min/max, so a 100 TB scan reduces to |buckets| rows per
    // partition before the exchange; no per-bucket sort window, no
    // self-join. Values in exact cents (the win_range adjudication).
    "ts_downsample" -> ((s, dir) => {
      val k = unix_millis(col("ts").cast("timestamp")) * lit(4194304L) +
        col("event_id")
      Tables(s, dir).events
        .select(window(col("ts"), "1 hour").getField("start").as("bucket"),
          round(col("value") * 100).cast("long").as("cents"), k.as("k"))
        .groupBy("bucket")
        .agg(
          min_by(col("cents"), col("k")).as("open_cents"),
          max(col("cents")).as("high_cents"),
          min(col("cents")).as("low_cents"),
          max_by(col("cents"), col("k")).as("close_cents"),
          count(lit(1)).as("n"),
          sum(col("cents")).as("vol_cents"))
        .orderBy("bucket")
    }),

    // time-series gap-fill + forward-fill (time_bucket_gapfill / LOCF —
    // the op every monitoring/feature pipeline needs before resampling):
    // per user, DENSE hourly buckets from first to last activity via
    // sequence()+explode (no self-join, no driver loop), left-joined
    // with the hourly aggregate; empty buckets carry n=0 and the value
    // forward-fills with last(ignoreNulls) — one window. Money sums in
    // exact DECIMAL before the double cast (the house order-independence
    // rule), so every column is deterministic cross-engine. At scale the
    // generated rows are bounded by users×span-hours and the whole plan
    // is one agg + one broadcastable span table + one window, all
    // co-partitioned on user_id.
    "ts_gapfill" -> ((s, dir) => {
      val ev = Tables(s, dir).events
        .withColumn("bucket", date_trunc("hour", col("ts")))
      val agg = ev.groupBy("user_id", "bucket")
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("v"))
      // r19 (guide §1.2/§2.4/§6): the r18 "derive spans from agg" share
      // was silently defeated — Catalyst COLLAPSED the two-level
      // min/max-over-groupBy into an independent min/max-over-events
      // branch with its own scan and exchange, so the executed plan
      // still read events twice and joined back (the r19 ExecPlan dump
      // showed 2 FileScans + a BroadcastHashJoin). Gap-fill is instead
      // a pure UNFOLD of the aggregate: each (user, bucket) row emits
      // the dense hours [bucket, lead(bucket) − 1h] (the last row emits
      // itself), n/v belong to the generating hour only, and LOCF is
      // the generating row's own running last(v, ignoreNulls) — for a
      // PRESENT bucket that is exactly the original window value, and a
      // generated hour inherits its generating (latest preceding
      // present) bucket's fill, including the all-NULL-bucket edge.
      // ONE events scan, no join, no second aggregate; both window
      // functions share one (user_id, bucket) Window node over the
      // bucket-scale table.
      val w = Window.partitionBy("user_id").orderBy("bucket")
      val filled = agg
        .withColumn("v_ff", last(col("v"), ignoreNulls = true)
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("nxt", lead(col("bucket"), 1).over(w))
        .select(col("user_id"), col("bucket"), col("n"), col("v"), col("v_ff"),
          explode(sequence(col("bucket"),
            coalesce(col("nxt") - expr("interval 1 hour"), col("bucket")),
            expr("interval 1 hour"))).as("bkt"))
      filled.select(
        col("user_id"), col("bkt").as("bucket"),
        when(col("bkt") === col("bucket"), col("n")).otherwise(lit(0L)).as("n"),
        when(col("bkt") === col("bucket"), col("v")).as("v"),
        col("v_ff").as("v_filled"))
        .orderBy("user_id", "bucket")
    }),

    // per-bucket latency-style percentile report (the P50/P95/P99 table
    // every monitoring dashboard renders): exact interpolated
    // percentiles per hour, all three riding ONE aggregation buffer
    // (the agg_percentile array idiom — one counts-map per bucket, not
    // three)
    "ts_percentiles" -> ((s, dir) =>
      Tables(s, dir).events
        .groupBy(date_trunc("hour", col("ts")).as("bucket"))
        .agg(count(lit(1)).as("n"),
          percentile(col("value"),
            array(lit(0.5), lit(0.95), lit(0.99))).as("ps"))
        .select(col("bucket"), col("n"),
          element_at(col("ps"), 1).as("p50"),
          element_at(col("ps"), 2).as("p95"),
          element_at(col("ps"), 3).as("p99"))
        .orderBy("bucket")),

    // RFM segmentation (the classic customer-analytics cut): per user,
    // recency (last activity), frequency (events) and monetary (exact
    // cents) quartiled into 4×4×4 segments. The quartile is an EXPLICIT
    // integer formula, q = (rn−1)·4 div n + 1 over row_number on
    // deterministic (metric, user_id) orders — round 16 adjudication:
    // SQL ntile's remainder distribution (here |users| = 150 → 150%4=2
    // leftover rows) proved engine-version-sensitive in the driver's
    // DuckDB while every evenly-divisible ntile id stayed green, so the
    // bucket arithmetic is spelled out in BIGINT on both sides and no
    // engine's ntile implementation is on the compare path. One events
    // aggregate + three windows over the |users|-row metric table.
    // Recency is emitted as epoch millis BIGINT (the win_range
    // precedent) — a raw TIMESTAMP column is hash-unstable across the
    // driver's canonicalizer.
    "rfm_segments" -> ((s, dir) => {
      // every ingredient here is a primitive some OTHER driver-green id
      // already emits verbatim: per-row ms (win_range's `ms` column),
      // integer max/count/sum, and round(value*100) cents (ts_anomaly)
      // — the aggregate-then-convert epoch_ms(max(ts)) form was the one
      // untested composition left after the r15 red, so recency is now
      // max over the per-row BIGINT instead
      val m = Tables(s, dir).events
        .withColumn("ms", unix_millis(col("ts").cast("timestamp")))
        .groupBy("user_id")
        .agg(max(col("ms")).as("last_ms"),
          count(lit(1)).as("freq"),
          sum(round(col("value") * 100).cast("long")).as("cents"))
      val rW = Window.orderBy(col("last_ms").desc, col("user_id"))
      val fW = Window.orderBy(col("freq").desc, col("user_id"))
      val mW = Window.orderBy(col("cents").desc, col("user_id"))
      val nUsers = Window.partitionBy()
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      m.withColumn("n_users", count(lit(1)).over(nUsers))
        .withColumn("r_rn", row_number().over(rW))
        .withColumn("f_rn", row_number().over(fW))
        .withColumn("m_rn", row_number().over(mW))
        .withColumn("r", expr("(CAST(r_rn - 1 AS BIGINT) * 4) DIV n_users + 1"))
        .withColumn("f", expr("(CAST(f_rn - 1 AS BIGINT) * 4) DIV n_users + 1"))
        .withColumn("m", expr("(CAST(m_rn - 1 AS BIGINT) * 4) DIV n_users + 1"))
        .withColumn("segment",
          concat(col("r"), lit("-"), col("f"), lit("-"), col("m")))
        .select("user_id", "last_ms", "freq", "cents", "r", "f", "m", "segment")
        .orderBy("user_id")
    }),

    // first-order Markov transition matrix of event types (the user-
    // journey report): P(next | current) from one lag window per user +
    // one counting aggregate; probabilities are count/count divisions
    // of exact longs (round 6 for cross-engine safety), denominators
    // via a window over the COUNT table (|types|² rows — free).
    "event_transitions" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val pairs = Tables(s, dir).events
        .withColumn("next_type", lead(col("event_type"), 1).over(w))
        .filter(col("next_type").isNotNull)
        .groupBy(col("event_type").as("cur"), col("next_type").as("nxt"))
        .agg(count(lit(1)).as("n"))
      val tot = Window.partitionBy("cur")
      pairs
        .withColumn("p", round(col("n").cast("double") /
          sum(col("n")).over(tot), 6))
        .orderBy("cur", "nxt")
    }),

    // top user-journey trigrams (path analysis): the 3-step sequences
    // users actually walk, from two lead windows + one count — no
    // per-user collect, no explode of whole histories.
    "event_paths" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val ord = Window.orderBy(col("n").desc, col("path"))
      Tables(s, dir).events
        .withColumn("t2", lead(col("event_type"), 1).over(w))
        .withColumn("t3", lead(col("event_type"), 2).over(w))
        .filter(col("t3").isNotNull)
        .select(concat_ws(">", col("event_type"), col("t2"), col("t3")).as("path"))
        .groupBy("path").agg(count(lit(1)).as("n"))
        .withColumn("rank", row_number().over(ord).cast("long"))
        .filter(col("rank") <= 20)
        .select("rank", "path", "n")
        .orderBy("rank")
    }),

    // rolling z-score anomaly detection (the monitoring staple): each
    // event scored against the PREVIOUS 20 events of its user (frame
    // excludes current — scoring a point against a window containing
    // itself dilutes the very outlier being tested). Every aggregate is
    // an exact integer in cents (the win_range idiom): Σx and Σx² over
    // the frame are exact longs, so μ = Σx/n, var = (Σx² − (Σx)²/n)/
    // (n−1) and z = (x−μ)/σ are single fixed-order double expressions —
    // deterministic cross-engine with no float-sum order anywhere.
    // Emits only |z| > 3 with n ≥ 10 prior events (cold keys and
    // zero-variance windows are not scoreable).
    "ts_anomaly" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(-20, -1)
      val n = count(lit(1)).over(w).cast("double")
      val s1 = sum(col("cents")).over(w).cast("double")
      val s2 = sum(col("cents") * col("cents")).over(w).cast("double")
      val varE = (s2 - s1 * s1 / n) / (n - 1)
      // NESTED guards, not one &&: the outer n≥10 branch keeps the
      // variance's (n−1) divisor away from cold keys (ANSI mode makes
      // 0-divides an ERROR, and And does not short-circuit under
      // codegen); the inner var>0 branch nulls out zero-variance
      // windows (a constant history makes z undefined — emitting ±inf
      // would flag every next value, the classic monitoring bug)
      // nPrev is the same count-over-w expression z's guard needs — kept
      // as an expression (not a materialized column) so every window
      // aggregate lands in ONE select and the plan carries a single
      // Window node (r19; referencing the n_prev COLUMN forced a second
      // sequential Window pass over every row's frame — same partition
      // and sort, pure duplicate frame work).
      val nPrev = count(lit(1)).over(w)
      val z = when(nPrev >= 10,
        when(varE > 0, round((col("cents") - s1 / n) / sqrt(varE), 6)))
      Tables(s, dir).events
        .withColumn("cents", round(col("value") * 100).cast("long"))
        .select(col("user_id"), col("event_id"), col("cents"),
          nPrev.as("n_prev"), z.as("z"))
        .filter(abs(col("z")) > 3)
        .orderBy("user_id", "event_id")
    }),

    "win_range" -> ((s, dir) => {
      // moving 1-hour sum per user; money in exact integer cents so the
      // frame aggregation is order-independent in both engines.
      val w = Window
        .partitionBy(col("user_id"))
        .orderBy(col("ms"))
        .rangeBetween(-3600000L, Window.currentRow)
      Tables(s, dir).events
        .withColumn("ms", unix_millis(col("ts").cast("timestamp")))
        .withColumn("cents", round(col("value") * 100).cast("long"))
        .withColumn("win_cents", sum(col("cents")).over(w))
        .select("user_id", "event_id", "ms", "win_cents")
        .orderBy("user_id", "event_id")
    }),

    // ---- §2.7 sorts / top-k ----------------------------------------
    "sort_global" -> ((s, dir) =>
      Tables(s, dir).orders
        .select("o_orderkey", "o_totalprice", "o_orderdate")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))),

    "topk" -> ((s, dir) =>
      Tables(s, dir).lineitem
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
        .limit(10)),

    // ---- §2.8 set operations ---------------------------------------
    "setop_union" -> ((s, dir) => {
      val t = Tables(s, dir)
      t.customer.select(col("c_nationkey").as("nk"))
        .union(t.supplier.select(col("s_nationkey").as("nk")))
        .distinct()
        .orderBy("nk")
    }),

    "setop_except" -> ((s, dir) => {
      val t = Tables(s, dir)
      t.customer.filter(col("c_custkey") < 100).select(col("c_custkey").as("k"))
        .except(t.orders.select(col("o_custkey").as("k")))
        .orderBy("k")
    }),

    "setop_intersect" -> ((s, dir) => {
      val t = Tables(s, dir)
      t.customer.filter(col("c_custkey") < 100).select(col("c_custkey").as("k"))
        .intersect(t.orders.select(col("o_custkey").as("k")))
        .orderBy("k")
    }),

    // ---- §2.9 scalar functions -------------------------------------
    "fn_string" -> ((s, dir) =>
      Tables(s, dir).part.select(
        col("p_partkey"),
        upper(col("p_name")).as("up"),
        lower(col("p_brand")).as("lo"),
        substring(col("p_name"), 1, 4).as("sub4"),
        length(col("p_name")).cast("long").as("len"),
        trim(concat(lit("  "), col("p_name"), lit("  "))).as("trimmed"),
        lpad(col("p_brand"), 10, "*").as("padded"),
        regexp_replace(col("p_name"), "a", "X").as("rexed")
      ).orderBy("p_partkey")),

    "fn_date" -> ((s, dir) =>
      Tables(s, dir).orders.select(
        col("o_orderkey"),
        year(col("o_orderdate")).cast("long").as("yr"),
        month(col("o_orderdate")).cast("long").as("mo"),
        dayofmonth(col("o_orderdate")).cast("long").as("dom"),
        date_trunc("month", col("o_orderdate")).as("mon_start"),
        datediff(col("o_orderdate"), lit("1995-01-01").cast("timestamp_ntz")).cast("long").as("days_since"),
        (col("o_orderdate") + expr("INTERVAL 30 DAYS")).as("plus30"),
        unix_millis(col("o_orderdate").cast("timestamp")).as("epoch_ms")
      ).orderBy("o_orderkey")),

    "fn_math" -> ((s, dir) =>
      Tables(s, dir).lineitem.select(
        col("l_orderkey"), col("l_linenumber"),
        abs(col("l_discount") - 0.05).as("abs_d"),
        round(col("l_tax") * 100).cast("long").as("tax_pct"),
        floor(col("l_quantity")).as("fl"),
        ceil(col("l_quantity")).as("ce"),
        sqrt(col("l_quantity")).as("rt"),
        (col("l_quantity").cast("long") % 7).as("m7")
      ).orderBy("l_orderkey", "l_linenumber")),

    "fn_cond" -> ((s, dir) =>
      Tables(s, dir).orders.select(
        col("o_orderkey"),
        when(col("o_totalprice") > 300000, "big")
          .when(col("o_totalprice") > 100000, "mid")
          .otherwise("small").as("bucket"),
        coalesce(expr("nullif(o_orderstatus, 'P')"), lit("PENDING")).as("st")
      ).orderBy("o_orderkey")),

    "fn_json" -> ((s, dir) =>
      Tables(s, dir).events.select(
        col("event_id"),
        get_json_object(col("props"), "$.k").as("k_str"),
        get_json_object(col("props"), "$.k").cast("long").as("k"),
        to_json(struct(col("event_id"), col("user_id"))).as("j")
      ).orderBy("event_id")),

    "fn_array" -> ((s, dir) =>
      Tables(s, dir).documents
        .withColumn("words", split(col("text"), " "))
        .select(
          col("doc_id"),
          size(col("words")).cast("long").as("n_words"),
          element_at(col("words"), 1).as("first_word"),
          array_contains(col("words"), "spark").as("has_spark"),
          array_join(array_sort(array_distinct(col("words"))), ",").as("uniq_words"))
        .orderBy("doc_id")),

    // regex surface (the workhorse of text cleaning): extract with a
    // capture group, replace-ALL (Spark's default — the DuckDB mirror
    // needs the explicit 'g' flag), occurrence count, boolean match
    "fn_regex" -> ((s, dir) =>
      Tables(s, dir).documents
        .select(
          col("doc_id"),
          regexp_extract(col("text"), "([a-z]+) ([a-z]+)", 2).as("second_word"),
          regexp_replace(col("text"), "spark", "SPARK").as("replaced"),
          regexp_count(col("text"), lit("spark")).cast("long").as("n_spark"),
          col("text").rlike("table .*scan").as("has_pattern"))
        .orderBy("doc_id")),

    // higher-order array functions as a first-class surface (they power
    // the whole dedup/vector family): lambda transform/filter/exists/
    // forall/fold/zip — all codegen-free but NARROW expressions, mirrored
    // by DuckDB's list lambdas. The fold keeps left-to-right order so the
    // double sum is bit-identical across engines.
    "fn_hof" -> ((s, dir) => {
      val ws = split(col("text"), " ")
      Tables(s, dir).documents
        .select(
          col("doc_id"),
          array_join(transform(ws, w => upper(w)), ",").as("upper_words"),
          size(filter(ws, w => length(w) > 4)).cast("long").as("n_long"),
          exists(ws, w => w === "spark").as("has_spark"),
          forall(ws, w => length(w) <= 10).as("all_short"),
          aggregate(ws, lit(0.0), (acc, w) => acc + length(w)).as("len_sum"),
          array_join(zip_with(ws, slice(ws, lit(2), size(ws)),
            (a, b) => concat_ws("-", a, b)), ",").as("zipped"))
        .orderBy("doc_id")
    }),

    "fn_hash" -> ((s, dir) =>
      Tables(s, dir).documents.select(
        col("doc_id"),
        md5(col("text")).as("h_md5"),
        sha2(col("text"), 256).as("h_sha256")
      ).orderBy("doc_id")),

    // ---- §1.2 interval wire types ----------------------------------
    // the reference configures interval-dts/interval-ytm columns
    // (scripts/OpenLogReplicator.json:18-19); SURVEY §1.2 maps them to
    // DayTimeIntervalType / YearMonthIntervalType. Arithmetic through
    // both typed intervals, results projected to timestamp/long for the
    // DuckDB compare.
    "fn_interval" -> ((s, dir) =>
      Tables(s, dir).orders.select(
        col("o_orderkey"),
        (col("o_orderdate") + make_ym_interval(lit(1), lit(2))).as("plus_1y2m"),
        (col("o_orderdate") - make_ym_interval(lit(0), lit(3))).as("minus_3m"),
        (col("o_orderdate") + make_dt_interval(lit(10), lit(5), lit(30), lit(1.5)))
          .as("plus_dt"),
        datediff(col("o_orderdate") + make_ym_interval(lit(1), lit(0)), col("o_orderdate"))
          .cast("long").as("days_plus_1y")
      ).orderBy("o_orderkey")),

    // ---- §2.3 subqueries (Catalyst decorrelation) ------------------
    // dialect-portable SQL: the EXACT oracle text runs through
    // spark.sql() too, so the engine surface being checked is Spark's
    // analyzer + decorrelation rules (correlated scalar → left outer
    // aggregate join; IN/NOT IN → semi/anti join).
    "subq_scalar" -> ((s, dir) => sqlBoth(s, dir, subqScalarSql)),
    "subq_in" -> ((s, dir) => sqlBoth(s, dir, subqInSql)),

    // ---- §2.10 session windows (batch-equivalent form) -------------
    "stream_session" -> ((s, dir) =>
      // gap-based sessionization; mirrored in the oracle by
      // gaps-and-islands SQL (break when the gap is >= 30 min, matching
      // session_window's exclusive [start, last+gap) end).
      Tables(s, dir).events
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(
          count(lit(1)).as("n"),
          sum(round(col("value") * 100).cast("long")).as("cents"))
        .select(
          col("user_id"),
          col("session_window.start").as("sess_start"),
          col("n"), col("cents"))
        .orderBy("user_id", "sess_start")),

    // ---- §2.10 tumbling window (batch-equivalent form) -------------
    "stream_tumble" -> ((s, dir) =>
      Tables(s, dir).events
        .groupBy(window(col("ts"), "1 hour").getField("start").as("bucket"))
        .agg(
          count(lit(1)).as("n"),
          sum(round(col("value") * 100).cast("long")).as("cents"))
        .orderBy("bucket")),

    // ---- §2.10 stream-stream interval join (batch-equivalent form):
    // clicks paired with a same-user error inside the following hour.
    // The streaming twin (Stream.intervalJoin — watermarks bound both
    // sides' state) is proven row-identical in StreamingSpec; this batch
    // form is the oracle-checked semantics. Scale shape: ONE key-shuffle
    // on user_id with the time bound as a residual predicate — never a
    // time-cross-product
    "stream_join" -> ((s, dir) => {
      val ev = Tables(s, dir).events
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("click_id"), col("ts").as("click_ts"))
      val errors = ev.filter(col("event_type") === "error")
        .select(col("user_id"), col("event_id").as("err_id"), col("ts").as("err_ts"))
      clicks.join(errors, Seq("user_id"))
        .filter(col("err_ts") >= col("click_ts") &&
          col("err_ts") <= col("click_ts") + expr("INTERVAL 60 MINUTES"))
        .select("user_id", "click_id", "err_id")
        .orderBy("user_id", "click_id", "err_id")
    }),

    // LEFT OUTER twin of stream_join: clicks with no error within the
    // hour surface with a null err_id. The interval predicate lives in
    // the join CONDITION, not a post-filter — filtering after an outer
    // join silently makes it inner; in the streaming form
    // (Stream.intervalJoin(joinType="left_outer"), StreamingSpec) the
    // same ON-clause bound is what lets the null row be emitted finally
    // once the right watermark passes click_ts + 60 min.
    "stream_join_outer" -> ((s, dir) => {
      val ev = Tables(s, dir).events
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id").as("c_uid"), col("event_id").as("click_id"), col("ts").as("click_ts"))
      val errors = ev.filter(col("event_type") === "error")
        .select(col("user_id").as("e_uid"), col("event_id").as("err_id"), col("ts").as("err_ts"))
      clicks.join(errors,
          col("c_uid") === col("e_uid") &&
            col("err_ts") >= col("click_ts") &&
            col("err_ts") <= col("click_ts") + expr("INTERVAL 60 MINUTES"),
          "left_outer")
        .select(col("c_uid").as("user_id"), col("click_id"), col("err_id"))
        .orderBy("user_id", "click_id", "err_id")
    }),

    // sliding (overlapping) windows: every event lands in width/slide
    // buckets; mirrored in the oracle by explicit offset expansion
    "stream_sliding" -> ((s, dir) =>
      Tables(s, dir).events
        .groupBy(window(col("ts"), "1 hour", "30 minutes").getField("start").as("bucket"))
        .agg(
          count(lit(1)).as("n"),
          sum(round(col("value") * 100).cast("long")).as("cents"))
        .orderBy("bucket")),

    // window frame surface: first/last/nth over an explicit full frame
    // (last_value over the default frame is the classic footgun — pinned
    // here to unbounded following, mirrored exactly in the oracle)
    "win_first" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables(s, dir).events.select(
        col("user_id"), col("event_id"), col("value"),
        first(col("value")).over(w).as("first_v"),
        last(col("value")).over(w).as("last_v"),
        nth_value(col("value"), 2).over(w).as("second_v")
      ).orderBy("user_id", "event_id")
    }),

    // TPC-H Q3-shaped headline: selective dim filter → two fact joins →
    // exact decimal revenue → top-k. The plan to want at 100 TB:
    // broadcast nothing here (customer filter is still large), both
    // joins key-shuffle with AQE free to re-plan, decimal-exact sum with
    // map-side partials, TakeOrderedAndProject for the top 10
    "q3_shipping" -> ((s, dir) => {
      val t = Tables(s, dir)
      val one = lit(1).cast(DecimalType(18, 2))
      t.customer.filter(col("c_mktsegment") === "BUILDING")
        .join(t.orders, col("c_custkey") === col("o_custkey"))
        .filter(col("o_orderdate") < lit("1995-03-15").cast("timestamp_ntz"))
        .join(t.lineitem, col("o_orderkey") === col("l_orderkey"))
        .filter(col("l_shipdate") > lit("1995-03-15").cast("timestamp_ntz"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(sum(dec("l_extendedprice") * (one - dec("l_discount")))
          .cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderdate"), col("l_orderkey"))
        .limit(10)
    }),

    // TPC-H Q5-shaped headline: region-restricted local-supplier revenue.
    // Six tables in one plan; the c_nationkey = s_nationkey "local
    // supplier" predicate rides the lineitem⋈supplier join as a residual.
    // At 100 TB: nation/region broadcast (tiny dims), customer⋈orders and
    // orders⋈lineitem key-shuffle under AQE, supplier shuffles on suppkey
    // — no all-pairs stage, aggregation has map-side partials.
    "q5_local" -> ((s, dir) => {
      val t = Tables(s, dir)
      // r19 join-order rewrite (guide §3): the old shape started from
      // customer ⋈ orders (a hinted sort-merge — two exchanges) and then
      // attached the FACT table by broadcasting it (the planner put the
      // 600k-row lineitem on the build side). Canonical Q5 is
      // fact-centric: the region='ASIA' prune flows region → nation →
      // supplier into ONE tiny broadcast that prunes the lineitem scan
      // to ~1/5 of its rows before anything else touches it; the
      // date-filtered orders and customer attach as broadcast probes.
      // One pass over the fact, zero fact-table exchanges before the
      // 5-row aggregate; the decimal sum is order-independent, so the
      // reorder is value-identical (same inner-join graph, same
      // predicates — oracle-checked).
      val asiaSupp = t.supplier
        .join(
          broadcast(t.nation
            .join(broadcast(t.region), col("n_regionkey") === col("r_regionkey"))
            .filter(col("r_name") === "ASIA")),
          col("s_nationkey") === col("n_nationkey"))
        .select("s_suppkey", "s_nationkey", "n_name")
      t.lineitem
        .join(broadcast(asiaSupp), col("l_suppkey") === col("s_suppkey"))
        .join(
          t.orders.filter(
            col("o_orderdate") >= lit("1996-01-01").cast("timestamp_ntz") &&
              col("o_orderdate") < lit("1997-01-01").cast("timestamp_ntz")),
          col("l_orderkey") === col("o_orderkey"))
        .join(t.customer,
          col("o_custkey") === col("c_custkey") &&
            col("c_nationkey") === col("s_nationkey"))
        .groupBy("n_name")
        .agg(sum(dec("l_extendedprice") * (lit(1) - dec("l_discount")))
          .cast("double").as("revenue"))
        .orderBy("n_name")
    }),

    // TPC-H Q6-shaped headline: the pure scan-filter-aggregate probe.
    // Every predicate is parquet-pushable (shipdate range, discount band,
    // quantity cap) and the projection is 2 columns — the id exists to
    // keep the "filters reach the scan" property measured end-to-end on
    // the biggest fact table (PlanHygieneSpec asserts the pushdown).
    "q6_forecast" -> ((s, dir) =>
      Tables(s, dir).lineitem
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp_ntz") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp_ntz") &&
          col("l_discount").between(0.05, 0.07) &&
          col("l_quantity") < 24)
        .agg(sum(dec("l_extendedprice") * dec("l_discount"))
          .cast("double").as("revenue"))),

    // TPC-H Q10-shaped headline: returned-item losses per customer,
    // top 20. Revenue ties broken by c_custkey so the limit is total-
    // ordered (SURVEY §7.5 determinism rule); TakeOrderedAndProject
    // keeps the top-k partition-local before the single driver merge.
    "q10_returns" -> ((s, dir) => {
      val t = Tables(s, dir)
      t.customer
        .join(t.orders.hint("merge"), col("c_custkey") === col("o_custkey"))
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp_ntz") &&
          col("o_orderdate") < lit("1996-07-01").cast("timestamp_ntz"))
        .join(t.lineitem, col("o_orderkey") === col("l_orderkey"))
        .filter(col("l_returnflag") === "R")
        .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(sum(dec("l_extendedprice") * (lit(1) - dec("l_discount")))
          .cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    }),

    // TPC-H Q7-shaped headline: bilateral trade volume between two
    // nations by ship year. The nation dims join TWICE under different
    // role names (supplier's vs customer's nation) — both broadcast
    // (25 rows), so the only shuffles are the three fact joins, all
    // key-shuffles under AQE. The symmetric pair filter runs AFTER both
    // dims attach (it references both roles); year() stays an expression
    // over the shuffled rows — no pre-aggregation materializes a
    // year column early, so the groupBy's map-side partials see the
    // already-filtered slice only.
    "q7_volume" -> ((s, dir) => {
      val t = Tables(s, dir)
      val suppNation = broadcast(t.nation.select(
        col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation")))
      val custNation = broadcast(t.nation.select(
        col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation")))
      t.supplier
        .join(t.lineitem, col("s_suppkey") === col("l_suppkey"))
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp_ntz") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp_ntz"))
        .join(t.orders, col("l_orderkey") === col("o_orderkey"))
        .join(t.customer, col("o_custkey") === col("c_custkey"))
        .join(suppNation, col("s_nationkey") === col("s_nk"))
        .join(custNation, col("c_nationkey") === col("c_nk"))
        .filter(
          (col("supp_nation") === "NATION_0" && col("cust_nation") === "NATION_1") ||
          (col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_0"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).cast("long").as("l_year"))
        .agg(sum(dec("l_extendedprice") * (lit(1) - dec("l_discount")))
          .cast("double").as("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    }),

    // TPC-H Q13-shaped headline: order-count distribution per customer.
    // The ON-clause extra predicate (priority exclusion) belongs to the
    // JOIN, not a WHERE — pushed onto the orders side BEFORE the outer
    // join so zero-order customers survive with count 0. Two hash
    // aggregations: per-customer (shuffle on c_custkey — but the outer
    // join already partitioned by it, so AQE coalesces) then the tiny
    // histogram over distinct counts.
    "q13_custdist" -> ((s, dir) => {
      val t = Tables(s, dir)
      t.customer
        .join(t.orders.filter(col("o_orderpriority") =!= "5-LOW"),
          col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    }),

    // TPC-H Q14-shaped headline: promo revenue share in one month. The
    // conditional and unconditional revenue sums ride the SAME exact
    // decimal aggregation pass; each is cast to DOUBLE only after the
    // exact sum completes (the repo's decimal-determinism rule —
    // rescaling the decimal would hit Spark/DuckDB rounding-mode skew),
    // and the 100·promo/total arithmetic is fixed left-to-right so both
    // engines evaluate bit-identically.
    "q14_promo" -> ((s, dir) => {
      val t = Tables(s, dir)
      val rev = dec("l_extendedprice") * (lit(1) - dec("l_discount"))
      t.lineitem
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp_ntz") &&
          col("l_shipdate") < lit("1996-02-01").cast("timestamp_ntz"))
        .join(t.part, col("l_partkey") === col("p_partkey"))
        .agg(
          sum(when(col("p_type") === "PROMO", rev)).cast("double").as("promo"),
          sum(rev).cast("double").as("total"))
        .select((lit(100.0) * col("promo") / col("total")).as("promo_revenue"))
    }),

    // TPC-H Q18-shaped headline: large-quantity orders (top 100). The
    // HAVING runs on the lineitem-only aggregate FIRST — the (tiny)
    // qualifying order set then drives both dimension joins, so orders/
    // customer attach to dozens of rows, not 60k. AQE broadcasts the
    // aggregated side; TakeOrderedAndProject caps the result
    // partition-local before the driver merge. l_quantity values are
    // small integers stored as double, so the sums are FP-exact and the
    // threshold/hash are merge-order-independent.
    "q18_bigqty" -> ((s, dir) => {
      val t = Tables(s, dir)
      val bigOrders = t.lineitem
        .groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity")).as("qty"))
        .filter(col("qty") > 300)
      bigOrders
        .join(t.orders, col("l_orderkey") === col("o_orderkey"))
        .join(t.customer, col("o_custkey") === col("c_custkey"))
        .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
          col("o_orderdate"), col("o_totalprice"), col("qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
    }),

    // TPC-H Q2-shaped: min-cost supplier per part. The fixture star has
    // no partsupp table, so the unit-cost catalog is DERIVED: min unit
    // price each (part, supplier) pair actually shipped at, restricted
    // to one region. The shape under test is the decorrelated min
    // subquery — catalog → per-part min → equality join back — which
    // Catalyst runs as two aggregations over one shuffled catalog, no
    // correlated re-scan per part. Plan discipline: the ~0.5%-selective
    // part prune BROADCASTS into the fact scan before anything shuffles,
    // the supplier prune rides a semi-join of keys only, the catalog
    // aggregation keys on exactly (partkey, suppkey), and the
    // supplier/nation/part ATTRIBUTES attach to the tiny
    // post-aggregation survivor set — filtering before the per-part min
    // is value-identical to the oracle's filter-after form because both
    // prunes are per-part/per-supplier. The unit price is exact integer
    // MICRO-UNITS end-to-end (round 16: the float-boundary audit found
    // an sf0.01 row whose raw unit_cost·10⁶ lands exactly on .5, where
    // engines' round() implementations may legally disagree): cents =
    // round(price·100) is integral-safe on 2-decimal data, qty is
    // integral, so uc_e6 = round(cents·10⁴/qty) = (2c·10⁴ + q) div 2q
    // exactly — the min, the min-equality join back, and the output all
    // compare BIGINTs; no IEEE value exists anywhere in the id.
    "q2_mincost" -> ((s, dir) => {
      val t = Tables(s, dir)
      val parts = t.part.filter(col("p_size") <= 15 && col("p_type") === "LARGE")
      val euroSupp = t.supplier
        .join(broadcast(t.nation), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(t.region), col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name") === "EUROPE")
      val supply = t.lineitem
        .join(broadcast(parts.select("p_partkey")),
          col("l_partkey") === col("p_partkey"))
        .join(euroSupp.select("s_suppkey"),
          col("l_suppkey") === col("s_suppkey"), "left_semi")
        .withColumn("cents", round(col("l_extendedprice") * 100).cast("long"))
        .withColumn("qty", col("l_quantity").cast("long"))
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(min(expr("(2 * cents * 10000 + qty) DIV (2 * qty)")).as("unit_cost"))
      val minCost = supply.groupBy(col("l_partkey"))
        .agg(min(col("unit_cost")).as("min_cost"))
      supply.join(minCost, Seq("l_partkey"))
        .filter(col("unit_cost") === col("min_cost"))
        .join(euroSupp.select("s_suppkey", "s_name", "s_acctbal", "n_name"),
          col("l_suppkey") === col("s_suppkey"))
        .join(parts.select("p_partkey", "p_name"),
          col("l_partkey") === col("p_partkey"))
        .select(col("s_acctbal"), col("s_name"), col("n_name"), col("p_partkey"),
          col("p_name"), col("unit_cost").as("unit_cost_e6"))
        .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"), col("p_partkey"))
        .limit(100)
    }),

    // TPC-H Q4-shaped: order-priority checking via EXISTS. The fixture
    // carries no commit/receipt dates, so "problem order" = a lineitem
    // shipped >60 days after the order date. The semi-join carries the
    // non-equi lateness predicate alongside the key — one pass over
    // lineitem, no pre-aggregation, each order emitted at most once
    // (LeftSemi), which is the whole point of the EXISTS shape vs a
    // join+distinct.
    "q4_priority" -> ((s, dir) => {
      val t = Tables(s, dir)
      t.orders
        .filter(col("o_orderdate") >= lit("1996-07-01").cast("timestamp_ntz") &&
          col("o_orderdate") < lit("1996-10-01").cast("timestamp_ntz"))
        .join(t.lineitem.select("l_orderkey", "l_shipdate"),
          col("o_orderkey") === col("l_orderkey") &&
            col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"),
          "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")
    }),

    // TPC-H Q8-shaped: one nation's market share inside one region's
    // market. Both nation roles broadcast (the dim joins twice under
    // different keys); the share is a ratio of two sums off ONE
    // aggregation pass (no second scan for the denominator) — numerator
    // conditional, denominator total, divided AFTER the exact decimal
    // sums complete, per the repo's decimal-determinism rule.
    "q8_share" -> ((s, dir) => {
      val t = Tables(s, dir)
      val custN = broadcast(t.nation.select(
        col("n_nationkey").as("cn_key"), col("n_regionkey").as("cn_region")))
      val suppN = broadcast(t.nation.select(
        col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation")))
      val rev = dec("l_extendedprice") * (lit(1) - dec("l_discount"))
      t.part.filter(col("p_type") === "ECONOMY")
        .join(t.lineitem, col("p_partkey") === col("l_partkey"))
        .join(t.orders, col("l_orderkey") === col("o_orderkey"))
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp_ntz") &&
          col("o_orderdate") < lit("1998-01-01").cast("timestamp_ntz"))
        .join(t.customer, col("o_custkey") === col("c_custkey"))
        .join(custN, col("c_nationkey") === col("cn_key"))
        .join(broadcast(t.region), col("cn_region") === col("r_regionkey"))
        .filter(col("r_name") === "ASIA")
        .join(t.supplier, col("l_suppkey") === col("s_suppkey"))
        .join(suppN, col("s_nationkey") === col("sn_key"))
        .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
        .agg((sum(when(col("supp_nation") === "NATION_2", rev)).cast("double") /
          sum(rev).cast("double")).as("mkt_share"))
        .orderBy("o_year")
    }),

    // TPC-H Q9-shaped: product-type profit by nation and year. No
    // partsupp → the cost basis is p_retailprice (documented fixture
    // adaptation); profit = revenue − retail·quantity stays exact
    // decimal until the final DOUBLE cast. The LIKE filter prunes part
    // FIRST (the only selective predicate), and nation broadcasts into
    // the supplier side.
    "q9_profit" -> ((s, dir) => {
      val t = Tables(s, dir)
      val amount = dec("l_extendedprice") * (lit(1) - dec("l_discount")) -
        dec("p_retailprice") * dec("l_quantity")
      t.part.filter(col("p_name").like("%red%"))
        .join(t.lineitem, col("p_partkey") === col("l_partkey"))
        .join(t.supplier, col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t.nation), col("s_nationkey") === col("n_nationkey"))
        .join(t.orders, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("n_name").as("nation"),
          year(col("o_orderdate")).cast("long").as("o_year"))
        .agg(sum(amount).cast("double").as("sum_profit"))
        .orderBy(col("nation"), col("o_year").desc)
    }),

    // TPC-H Q11-shaped: parts whose single-nation inventory value
    // exceeds 1.5× the average part's value. The global threshold is a
    // 1-row broadcast (scalar-subquery shape); the comparison is in
    // MULTIPLICATION form (value·n·2 > total·3) on doubles derived from
    // the exact decimal sums — no decimal division whose scale/rounding
    // rules differ between engines, and IEEE multiply/compare is
    // bit-deterministic on both.
    "q11_value" -> ((s, dir) => {
      val t = Tables(s, dir)
      val vals = t.lineitem
        .join(t.supplier, col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t.nation), col("s_nationkey") === col("n_nationkey"))
        .filter(col("n_name") === "NATION_0")
        .groupBy(col("l_partkey"))
        .agg(sum(dec("l_extendedprice") * dec("l_quantity")).as("value"))
      val tot = vals.agg(
        sum(col("value")).cast("double").as("total"),
        count(lit(1)).cast("long").as("nparts"))
      vals.join(broadcast(tot))
        .filter(col("value").cast("double") * col("nparts") * lit(2.0) >
          col("total") * lit(3.0))
        .select(col("l_partkey"), col("value").cast("double").as("value"))
        .orderBy(col("value").desc, col("l_partkey"))
    }),

    // TPC-H Q12-shaped: late-shipment count split by priority class per
    // line status (no shipmode column in the fixture). Single
    // fact-to-fact join, lateness as a non-equi residual, and BOTH
    // output counts ride one aggregation pass as conditional count_ifs.
    "q12_late" -> ((s, dir) => {
      val t = Tables(s, dir)
      val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
      t.orders.join(t.lineitem, col("o_orderkey") === col("l_orderkey"))
        .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS") &&
          col("l_shipdate") >= lit("1996-01-01").cast("timestamp_ntz") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp_ntz"))
        .groupBy(col("l_linestatus"))
        .agg(count_if(high).as("high_line_count"),
          count_if(!high).as("low_line_count"))
        .orderBy("l_linestatus")
    }),

    // TPC-H Q15-shaped: the top supplier(s) by one quarter's revenue.
    // The max is a 1-row broadcast joined back on EXACT decimal equality
    // (both sides derive from the same exact sum — no double round-trip
    // before the comparison), so revenue ties all surface, as in the
    // spec's view formulation.
    "q15_topsupp" -> ((s, dir) => {
      val t = Tables(s, dir)
      val rev = t.lineitem
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp_ntz") &&
          col("l_shipdate") < lit("1996-04-01").cast("timestamp_ntz"))
        .groupBy(col("l_suppkey"))
        .agg(sum(dec("l_extendedprice") * (lit(1) - dec("l_discount"))).as("total_rev"))
      val mx = rev.agg(max(col("total_rev")).as("mx"))
      rev.join(broadcast(mx), col("total_rev") === col("mx"))
        .join(t.supplier, col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"),
          col("total_rev").cast("double").as("total_revenue"))
        .orderBy("s_suppkey")
    }),

    // TPC-H Q16-shaped: supplier count per part attribute bucket,
    // excluding flagged suppliers (negative balance stands in for the
    // spec's complaint-comment regex; no partsupp → supply relationships
    // come from lineitem). Anti-join BEFORE the distinct-count shuffle;
    // p_size widened to BIGINT on both engines for dtype parity.
    "q16_suppcnt" -> ((s, dir) => {
      val t = Tables(s, dir)
      val flagged = t.supplier.filter(col("s_acctbal") < 0)
        .select(col("s_suppkey").as("bad_key"))
      t.lineitem
        .join(t.part, col("l_partkey") === col("p_partkey"))
        .filter(col("p_brand") =!= "Brand#5" &&
          col("p_size").isin(1, 10, 20, 30, 40, 50))
        .join(flagged, col("l_suppkey") === col("bad_key"), "left_anti")
        .groupBy(col("p_brand"), col("p_type"), col("p_size").cast("long").as("p_size"))
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
    }),

    // TPC-H Q17-shaped: revenue lost to small-quantity orders. The
    // correlated per-part average decorrelates into one tiny aggregate
    // (≤ brand's part count rows) broadcast back into the fact scan.
    // l_quantity is integer-valued double ≤50 with bounded counts, so
    // sum/avg are EXACT in double on both engines — the 0.2·avg
    // threshold is bit-deterministic.
    "q17_smallqty" -> ((s, dir) => {
      val t = Tables(s, dir)
      val li = t.lineitem.join(
        t.part.filter(col("p_brand") === "Brand#3").select("p_partkey"),
        col("l_partkey") === col("p_partkey"))
      val avgQty = li.groupBy(col("p_partkey").as("ap_key"))
        .agg(avg(col("l_quantity")).as("avg_qty"))
      li.join(broadcast(avgQty), col("p_partkey") === col("ap_key"))
        .filter(col("l_quantity") < lit(0.2) * col("avg_qty"))
        .agg((sum(dec("l_extendedprice")).cast("double") / lit(7.0)).as("avg_yearly"))
    }),

    // TPC-H Q19-shaped: the disjunctive-predicate join. Three
    // brand/size/quantity bands OR'd together — the filter references
    // both sides, so it rides the join as a residual while the
    // single-side conjuncts (returnflag, the size floor) still push to
    // the scans; PlanHygieneSpec pins that split.
    "q19_disjunct" -> ((s, dir) => {
      val t = Tables(s, dir)
      val rev = dec("l_extendedprice") * (lit(1) - dec("l_discount"))
      t.lineitem.filter(col("l_returnflag") === "N")
        .join(t.part, col("l_partkey") === col("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#1" && col("p_size").between(1, 5) &&
            col("l_quantity").between(1, 11)) ||
          (col("p_brand") === "Brand#2" && col("p_size").between(1, 10) &&
            col("l_quantity").between(10, 20)) ||
          (col("p_brand") === "Brand#3" && col("p_size").between(1, 15) &&
            col("l_quantity").between(20, 30)))
        .agg(sum(rev).cast("double").as("revenue"))
    }),

    // TPC-H Q20-shaped: the nested-IN chain. No partsupp availqty → the
    // "excess stock" predicate becomes DOMINANCE: suppliers who shipped
    // more than half of some red-named part's total 1996 volume. Three
    // nested membership tests — supplier IN (dominant pairs) whose part
    // IN (name-filtered parts) — each a semi-join, the part filter
    // broadcast into the fact scan, per-pair and per-part sums off one
    // aggregation each (l_quantity sums are small-int exact in double,
    // so the 2·pair > part comparison is bit-deterministic).
    "q20_excess" -> ((s, dir) => {
      val t = Tables(s, dir)
      val redParts = t.part.filter(col("p_name").like("red%")).select("p_partkey")
      val shipped = t.lineitem
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp_ntz") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp_ntz"))
        .join(broadcast(redParts), col("l_partkey") === col("p_partkey"))
      val pairQty = shipped.groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(sum(col("l_quantity")).as("pair_qty"))
      // per-part totals re-aggregate the PAIR sums (sum of sums — exact,
      // small-int doubles) instead of scanning lineitem a second time;
      // the oracle computes the same value directly off lineitem
      val partQty = pairQty.groupBy(col("l_partkey").as("pq_key"))
        .agg(sum(col("pair_qty")).as("part_qty"))
      val dominant = pairQty
        .join(partQty, col("l_partkey") === col("pq_key"))
        .filter(col("pair_qty") * 2 > col("part_qty"))
        .select(col("l_suppkey"))
      t.supplier
        .join(broadcast(t.nation), col("s_nationkey") === col("n_nationkey"))
        .filter(col("n_name") === "NATION_1")
        .join(dominant, col("s_suppkey") === col("l_suppkey"), "left_semi")
        .select(col("s_suppkey"), col("s_name"), col("s_acctbal"))
        .orderBy("s_suppkey")
    }),

    // TPC-H Q21-shaped: suppliers who kept orders waiting. No
    // commit/receipt dates → the "fault" marker is a returned lineitem
    // (l_returnflag = 'R') in a finished multi-supplier order where NO
    // other supplier's line was returned. The EXISTS/NOT-EXISTS pair is
    // folded into ONE per-order supplier census instead of two extra
    // fact-table probes: lineitem reduces once to (order, supplier,
    // saw-R) — a map-side-combinable partial, so the only full-width
    // shuffle carries distinct pairs, not rows — then a per-order
    // verdict keeps orders with ≥2 suppliers and EXACTLY ONE at fault.
    // An l1 row is R-flagged, so "its order's only faulty supplier" is
    // necessarily itself: semi-joining the verdict is equivalent to the
    // semi (another supplier exists) + anti (no OTHER faulty supplier)
    // pair, at 1 lineitem pass instead of 3 (this was the steepest
    // measured TPC-H slope, 0.23× lin at 25× — pure shuffle volume).
    // The selective supplier/nation prune still runs FIRST so the final
    // probe carries one nation's suppliers only.
    "q21_waiting" -> ((s, dir) => {
      // r18-opt (guide §1.2/§2.4): ONE lineitem scan instead of two —
      // the old form scanned lineitem for the R rows (l1) AND for the
      // per-(order, supplier) verdict aggregate, then semi-joined them
      // back on the order key. The single (l_orderkey, l_suppkey)
      // aggregate carries nr = #R rows per pair; the per-order
      // supplier counts come from a window over that aggregate
      // (per-order partitions — bounded by suppliers-per-order), and
      // numwait = Σ nr over qualifying pairs ≡ the old count of R rows
      // in qualifying orders (an order with nsupp_r = 1 holds ALL its
      // R rows on that one supplier). Values identical by construction.
      val t = Tables(s, dir)
      val wOrd = Window.partitionBy(col("l_orderkey"))
      val g = t.lineitem
        .groupBy(col("l_orderkey"), col("l_suppkey"))
        .agg(count(when(col("l_returnflag") === "R", lit(1))).as("nr"))
        .withColumn("nsupp", count(lit(1)).over(wOrd))
        .withColumn("nsupp_r",
          sum(when(col("nr") > 0, 1L).otherwise(0L)).over(wOrd))
        .filter(col("nr") > 0 && col("nsupp") >= 2 && col("nsupp_r") === 1)
      g.join(t.orders.filter(col("o_orderstatus") === "F").select("o_orderkey"),
          col("l_orderkey") === col("o_orderkey"))
        .join(t.supplier, col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t.nation), col("s_nationkey") === col("n_nationkey"))
        .filter(col("n_name") === "NATION_0")
        .groupBy(col("s_name"))
        .agg(sum(col("nr")).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
        .limit(20)
    }),

    // TPC-H Q22-shaped: well-funded customers with no LARGE order.
    // Market segments stand in for the spec's phone prefixes, and the
    // anti-join target is "no order above 300k" rather than "no order at
    // all" — this fixture's order/customer ratio leaves no orderless
    // customers, which would make the spec's exact predicate vacuously
    // empty. The positive-balance average is a 1-row broadcast compared
    // in multiplication form (balance·n > sum, exact decimals — no
    // division); the filter on the anti side prunes orders BEFORE the
    // key shuffle.
    "q22_balance" -> ((s, dir) => {
      val t = Tables(s, dir)
      val segs = Seq("AUTOMOBILE", "BUILDING", "MACHINERY")
      val base = t.customer.filter(col("c_mktsegment").isin(segs: _*))
      val posAvg = base.filter(col("c_acctbal") > 0)
        .agg(sum(dec("c_acctbal")).as("possum"),
          count(lit(1)).cast("long").as("poscnt"))
      base.join(broadcast(posAvg))
        .filter(dec("c_acctbal") * col("poscnt") > col("possum"))
        .join(t.orders.filter(col("o_totalprice") > 300000).select(col("o_custkey")),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("numcust"),
          sum(dec("c_acctbal")).cast("double").as("totacctbal"))
        .orderBy("c_mktsegment")
    }),

    // ntile quartiles per segment — the bucketing window the sampling
    // family doesn't cover. Order key carries the unique c_custkey
    // tiebreak so bucket boundaries are total-ordered in both engines.
    // This id IS the ntile operator test, so engine ntile sits on the
    // compare path by necessity (verify-skill rule exemption) — and
    // since round 18 it is SELF-AUDITING: `ntile_parity` recomputes the
    // SQL-standard remainder placement explicitly (first n mod k buckets
    // get ceil(n/k) rows, the rest floor(n/k)) and must equal engine
    // ntile row-by-row IN EACH ENGINE, so a remainder-placement
    // divergence in either engine flips its own boolean and reds the
    // hash compare.
    "win_ntile" -> ((s, dir) => {
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("c_acctbal"), col("c_custkey"))
      val wp = Window.partitionBy(col("c_mktsegment"))
      Tables(s, dir).customer
        .select(col("c_mktsegment"), col("c_custkey"), col("c_acctbal"),
          ntile(4).over(w).cast("long").as("quartile"),
          row_number().over(w).cast("long").as("__rn"),
          count(lit(1)).over(wp).as("__n"))
        // greatest(...,1): the ELSE divisor is dead when __n < 4 (the
        // WHEN arm then covers every row), guarded anyway so a tiny
        // partition can never divide by zero under eager evaluation.
        .withColumn("ntile_parity", col("quartile") === expr(
          """CASE WHEN __rn <= (__n % 4) * (__n DIV 4 + 1)
            |     THEN (__rn - 1) DIV (__n DIV 4 + 1) + 1
            |     ELSE (__n % 4) + (__rn - (__n % 4) * (__n DIV 4 + 1) - 1)
            |          DIV greatest(__n DIV 4, 1L) + 1
            |END""".stripMargin))
        .drop("__rn", "__n")
        .orderBy("c_mktsegment", "c_custkey")
    }),

    // grouped top-k: rank window + filter, NOT a global sort — each
    // group's k survivors are found after one hash shuffle on the group
    // key, and rows past rank k never leave their partition. At 100 TB
    // this is the shape for "top sellers per category"-class queries;
    // a global orderBy+limit would serialize the whole table instead.
    "topk_group" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables(s, dir).orders
        .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"))
        .withColumn("rk", row_number().over(w).cast("long"))
        .filter(col("rk") <= 3)
        .orderBy("o_orderpriority", "rk")
    }),

    // deterministic mode: count per (group, value) then rank by
    // (count desc, value) — ties break to the smallest value, unlike the
    // built-in `mode` whose tie choice is engine-defined (and therefore
    // un-hashable cross-engine). Two map-side-combinable shuffles.
    "agg_mode" -> ((s, dir) => {
      val counts = Tables(s, dir).lineitem
        .groupBy(col("l_returnflag"), col("l_quantity"))
        .agg(count(lit(1)).as("n_occurrences"))
      val w = Window.partitionBy(col("l_returnflag"))
        .orderBy(col("n_occurrences").desc, col("l_quantity"))
      counts.withColumn("rk", row_number().over(w))
        .filter(col("rk") === 1)
        .select(col("l_returnflag"), col("l_quantity").as("mode_qty"),
          col("n_occurrences"))
        .orderBy("l_returnflag")
    })
  )

  def oracleSql: Map[String, String] = Map(
    // full HLL register replay: same md5-prefix hash, same 45−bitlength
    // rank, same scaled integer register sum, same constant-folded
    // one-division estimator (round-6) — see the query's scaladoc
    "agg_approx" ->
      """WITH vals AS (
        |  SELECT 'part' AS col_name, CAST(l_partkey AS BIGINT) AS v FROM lineitem
        |  UNION ALL
        |  SELECT 'order', CAST(l_orderkey AS BIGINT) FROM lineitem),
        |hashed AS (
        |  SELECT col_name,  v,
        |    CAST(CAST('0x' || substr(md5('hll:' || CAST(v AS VARCHAR)), 1, 2) AS INTEGER) AS BIGINT) % 64 AS b,
        |    CAST('0x' || substr(md5('hll:' || CAST(v AS VARCHAR)), 3, 11) AS BIGINT) AS rest
        |  FROM vals),
        |regs AS (
        |  SELECT col_name, b,
        |    CAST(MAX(CASE WHEN rest = 0 THEN 45 ELSE 45 - length(bin(rest)) END) AS BIGINT) AS mr
        |  FROM hashed GROUP BY 1, 2),
        |summary AS (
        |  SELECT col_name,
        |    CAST(64 - count(*) AS BIGINT) AS v_zero,
        |    CAST(sum(CAST(1 AS BIGINT) << CAST(45 - mr AS INTEGER)) + (64 - count(*)) * CAST(35184372088832 AS BIGINT) AS BIGINT) AS s,
        |    md5(string_agg(b || ':' || mr, ',' ORDER BY b)) AS reg_digest
        |  FROM regs GROUP BY 1),
        |ex AS (SELECT col_name, count(DISTINCT v) AS exact_n FROM vals GROUP BY 1)
        |SELECT e.col_name, e.exact_n, m.v_zero, m.s, m.reg_digest,
        |  round(0.7213 / (1.0 + 1.079 / 64.0) * 64.0 * 64.0 * 35184372088832.0 / CAST(m.s AS DOUBLE), 6) AS raw_est,
        |  abs(round(0.7213 / (1.0 + 1.079 / 64.0) * 64.0 * 64.0 * 35184372088832.0 / CAST(m.s AS DOUBLE), 6) - CAST(e.exact_n AS DOUBLE)) <= 0.39 * CAST(e.exact_n AS DOUBLE) AS within_tol
        |FROM ex e JOIN summary m USING (col_name)
        |ORDER BY col_name""".stripMargin,
    "agg_stats" ->
      """SELECT l_returnflag,
        |  round(stddev_samp(l_quantity), 6) AS qty_sd,
        |  round(var_samp(l_quantity), 6) AS qty_var,
        |  round(corr(l_quantity, l_extendedprice), 6) AS qty_price_corr,
        |  round(covar_samp(l_quantity, l_extendedprice), 6) AS qty_price_cov
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "project" ->
      """SELECT p_partkey, upper(p_name) AS name_up, p_brand || '/' || p_type AS brand_type,
        |  p_size + 1 AS size1, p_retailprice FROM part ORDER BY p_partkey""".stripMargin,
    "filter_eq" ->
      "SELECT o_orderkey, o_custkey, o_totalprice FROM orders WHERE o_orderstatus = 'O' ORDER BY o_orderkey",
    "filter_range" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_shipdate FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_quantity BETWEEN 10 AND 20 ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "filter_like" ->
      """SELECT p_partkey, p_name FROM part
        |WHERE p_name LIKE '%gear%' OR p_name LIKE 'small%' ORDER BY p_partkey""".stripMargin,
    "filter_in" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE c_mktsegment IN ('BUILDING','AUTOMOBILE') ORDER BY c_custkey""".stripMargin,
    "filter_null" ->
      """SELECT o_orderkey, nullif(o_orderstatus,'P') AS st FROM orders
        |WHERE nullif(o_orderstatus,'P') IS NULL ORDER BY o_orderkey""".stripMargin,
    "join_broadcast" ->
      """SELECT n_nationkey, n_name, r_name FROM nation
        |JOIN region ON n_regionkey = r_regionkey ORDER BY n_nationkey""".stripMargin,
    "join_smj" ->
      """SELECT o_orderkey, o_totalprice, count(*) AS n_items, sum(l_quantity) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY o_orderkey, o_totalprice ORDER BY o_orderkey""".stripMargin,
    "join_star" ->
      """SELECT r_name, n_name, c_mktsegment, count(*) AS n_items,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name, c_mktsegment ORDER BY r_name, n_name, c_mktsegment""".stripMargin,
    "join_outer" ->
      """SELECT c_custkey, count(o_orderkey) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,
    "join_semi" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey) ORDER BY c_custkey""".stripMargin,
    "join_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey) ORDER BY c_custkey""".stripMargin,
    "join_cross" ->
      """SELECT a.r_name AS a, b.r_name AS b FROM region a CROSS JOIN region b ORDER BY a, b""",
    "join_range" ->
      """SELECT s_suppkey, c_custkey, s_acctbal, c_acctbal
        |FROM supplier JOIN customer
        |  ON s_nationkey = c_nationkey AND c_acctbal BETWEEN s_acctbal - 10 AND s_acctbal + 10
        |ORDER BY s_suppkey, c_custkey""".stripMargin,
    "agg_count" ->
      "SELECT count(*) AS n_rows, count(l_quantity) AS n_qty FROM lineitem",
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc,
        |  CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_disc,
        |  count(*) AS n
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-12-01'
        |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "agg_group" ->
      """SELECT c_mktsegment, count(*) AS n,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal,
        |  min(c_acctbal) AS min_bal, max(c_acctbal) AS max_bal
        |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "agg_distinct" ->
      """SELECT l_returnflag, count(DISTINCT l_suppkey) AS n_supp,
        |  count(DISTINCT l_partkey) AS n_part, count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "agg_rollup" ->
      """SELECT coalesce(o_orderstatus,'ALL') AS st, coalesce(o_orderpriority,'ALL') AS pri,
        |  count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority) ORDER BY st, pri""".stripMargin,
    "agg_cube" ->
      """SELECT coalesce(l_returnflag,'ALL') AS rf, coalesce(l_linestatus,'ALL') AS ls,
        |  sum(l_quantity) AS sum_qty, count(*) AS n
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus) ORDER BY rf, ls""".stripMargin,
    "agg_gsets" ->
      """SELECT coalesce(o_orderstatus,'ALL') AS st,
        |       coalesce(o_orderpriority,'ALL') AS pri, count(*) AS n
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY st, pri""".stripMargin,
    "agg_pivot" ->
      """SELECT o_orderpriority,
        |  count(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
        |  count(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
        |  count(*) FILTER (WHERE o_orderstatus = 'P') AS n_p
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "win_dist" ->
      """SELECT c_mktsegment, c_custkey, c_acctbal,
        |  ntile(4) OVER w AS quartile,
        |  percent_rank() OVER w AS pr,
        |  cume_dist() OVER w AS cd
        |FROM customer
        |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
        |ORDER BY c_mktsegment, c_custkey""".stripMargin,
    "agg_unpivot" ->
      """WITH c AS (
        |  SELECT o_orderpriority, o_orderstatus, count(*) AS n
        |  FROM orders GROUP BY 1, 2),
        |p AS (SELECT DISTINCT o_orderpriority FROM orders),
        |s AS (SELECT unnest(['F','O','P']) AS status)
        |SELECT p.o_orderpriority, s.status, coalesce(c.n, 0) AS n
        |FROM p CROSS JOIN s
        |LEFT JOIN c ON c.o_orderpriority = p.o_orderpriority AND c.o_orderstatus = s.status
        |ORDER BY p.o_orderpriority, s.status""".stripMargin,
    "fn_bitwise" ->
      """SELECT o_orderkey,
        |  o_orderkey & 255 AS and255,
        |  o_orderkey | 16 AS or16,
        |  xor(o_orderkey, 85) AS xor85,
        |  o_orderkey << 2 AS shl2,
        |  o_orderkey >> 3 AS shr3
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "agg_bool" ->
      """SELECT o_orderpriority,
        |  count(*) FILTER (WHERE o_totalprice > 100000) AS n_big,
        |  bool_and(o_totalprice > 0) AS all_pos,
        |  bool_or(o_totalprice > 400000) AS any_huge
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "fn_map" ->
      """SELECT p_partkey,
        |  map(['brand','type'], [p_brand, p_type])['brand'][1] AS brand,
        |  map(['brand','type'], [p_brand, p_type])['type'][1] AS type_,
        |  CAST(cardinality(map(['brand','type'], [p_brand, p_type])) AS BIGINT) AS m_size,
        |  array_to_string(map_keys(map(['brand','type'], [p_brand, p_type])), ',') AS keys
        |FROM part ORDER BY p_partkey""".stripMargin,
    // the deterministic-sample replay: same md5 16-bit row bucket, same
    // exact interpolated percentile over sample and full data
    "agg_approx_pct" ->
      """WITH sm AS (
        |  SELECT l_returnflag, l_quantity, l_extendedprice FROM lineitem
        |  WHERE CAST('0x' || substr(md5('pct:' || CAST(l_orderkey AS VARCHAR) || ':' ||
        |    CAST(l_linenumber AS VARCHAR)), 1, 4) AS INTEGER) < 4260),
        |s AS (
        |  SELECT l_returnflag, count(*) AS n_sample,
        |    quantile_cont(l_quantity, 0.5) AS qp50,
        |    quantile_cont(l_extendedprice, 0.9) AS pp90
        |  FROM sm GROUP BY 1),
        |x AS (
        |  SELECT l_returnflag, quantile_cont(l_quantity, 0.5) AS xq,
        |    quantile_cont(l_extendedprice, 0.9) AS xp
        |  FROM lineitem GROUP BY 1)
        |SELECT s.l_returnflag, n_sample,
        |  round(qp50, 6) AS qty_p50, round(pp90, 6) AS price_p90,
        |  (abs(qp50 - xq) <= abs(xq) * 0.10 AND abs(pp90 - xp) <= abs(xp) * 0.10) AS within_tol
        |FROM s JOIN x USING (l_returnflag) ORDER BY l_returnflag""".stripMargin,
    "agg_percentile" ->
      """SELECT l_returnflag,
        |  quantile_cont(l_quantity, 0.5) AS qty_p50,
        |  quantile_cont(l_quantity, 0.9) AS qty_p90,
        |  quantile_cont(l_extendedprice, 0.5) AS price_p50
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "agg_collect" ->
      """SELECT r_name, array_to_string(list_sort(list(n_name)), ',') AS nations, count(*) AS n
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,
    "win_rownum" ->
      """SELECT user_id, event_id, event_type, rn FROM (
        |  SELECT user_id, event_id, event_type,
        |         row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
        |  FROM events) WHERE rn <= 3 ORDER BY user_id, rn""".stripMargin,
    "win_rank" ->
      """SELECT c_mktsegment, c_custkey, c_acctbal, rk FROM (
        |  SELECT c_mktsegment, c_custkey, c_acctbal,
        |         rank() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC) AS rk
        |  FROM customer) WHERE rk <= 5 ORDER BY c_mktsegment, rk, c_custkey""".stripMargin,
    "win_lag" ->
      """SELECT user_id, event_id, value,
        |  lag(value, 1) OVER (PARTITION BY user_id ORDER BY event_id) AS prev_value,
        |  value - lag(value, 1) OVER (PARTITION BY user_id ORDER BY event_id) AS delta
        |FROM events ORDER BY user_id, event_id""".stripMargin,
    "win_running" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber, l_partkey, l_shipdate,
        |  sum(l_quantity) OVER (PARTITION BY l_suppkey
        |    ORDER BY l_shipdate, l_orderkey, l_linenumber, l_partkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_qty
        |FROM lineitem
        |ORDER BY l_suppkey, l_shipdate, l_orderkey, l_linenumber, l_partkey""".stripMargin,
    "funnel" ->
      """WITH s1 AS (
        |  SELECT user_id, event_type, ts, event_id,
        |    min(CASE WHEN event_type = 'view' THEN ts END) OVER
        |      (PARTITION BY user_id ORDER BY ts, event_id
        |       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS view_before
        |  FROM events),
        |s2 AS (
        |  SELECT *, CASE WHEN event_type = 'click' AND view_before IS NOT NULL
        |                 THEN ts END AS qual_click_ts FROM s1),
        |s3 AS (
        |  SELECT *, min(qual_click_ts) OVER
        |      (PARTITION BY user_id ORDER BY ts, event_id
        |       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS click_before
        |  FROM s2)
        |SELECT
        |  count(DISTINCT CASE WHEN event_type = 'view' THEN user_id END) AS n_view_users,
        |  count(DISTINCT CASE WHEN qual_click_ts IS NOT NULL THEN user_id END) AS n_click_users,
        |  count(DISTINCT CASE WHEN event_type = 'purchase' AND click_before IS NOT NULL
        |                 THEN user_id END) AS n_purchase_users
        |FROM s3""".stripMargin,
    "sessionize" ->
      """WITH g AS (
        |  SELECT user_id, event_id, epoch_ms(ts) AS ms,
        |    lag(epoch_ms(ts), 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ms
        |  FROM events),
        |b AS (
        |  SELECT user_id, event_id, ms,
        |    CASE WHEN prev_ms IS NULL OR ms - prev_ms > 1800000 THEN 1 ELSE 0 END AS brk
        |  FROM g)
        |SELECT user_id, event_id,
        |  CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ms, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
        |FROM b ORDER BY user_id, event_id""".stripMargin,
    // plain theta self-join reference — the engine's bin-bucketed
    // equi-join must produce exactly the naive overlap counts
    "join_interval" ->
      """WITH g AS (
        |  SELECT user_id, event_id, epoch_ms(ts) AS ms,
        |    lag(epoch_ms(ts), 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ms
        |  FROM events),
        |b AS (
        |  SELECT user_id, event_id, ms,
        |    CASE WHEN prev_ms IS NULL OR ms - prev_ms > 1800000 THEN 1 ELSE 0 END AS brk
        |  FROM g),
        |s AS (
        |  SELECT user_id, ms,
        |    sum(brk) OVER (PARTITION BY user_id ORDER BY ms, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS seq
        |  FROM b),
        |sess AS (SELECT user_id, seq, min(ms) AS st, max(ms) AS en FROM s GROUP BY 1, 2),
        |ov AS (
        |  SELECT a.user_id, a.seq, count(*) AS n_concurrent
        |  FROM sess a JOIN sess b2
        |    ON a.st <= b2.en AND b2.st <= a.en AND a.user_id <> b2.user_id
        |  GROUP BY 1, 2)
        |SELECT s2.user_id, CAST(s2.seq AS BIGINT) AS session_seq,
        |  CAST(coalesce(o.n_concurrent, 0) AS BIGINT) AS n_concurrent
        |FROM sess s2 LEFT JOIN ov o ON s2.user_id = o.user_id AND s2.seq = o.seq
        |ORDER BY s2.user_id, session_seq""".stripMargin,
    "cohort" ->
      """WITH w AS (
        |  SELECT user_id, date_trunc('week', ts) AS wk,
        |    min(date_trunc('week', ts)) OVER (PARTITION BY user_id) AS cohort_week
        |  FROM events)
        |SELECT cohort_week, CAST(datediff('day', cohort_week, wk) / 7 AS BIGINT) AS week_offset,
        |  count(DISTINCT user_id) AS n_active
        |FROM w GROUP BY 1, 2 ORDER BY cohort_week, week_offset""".stripMargin,
    "win_range" ->
      """SELECT user_id, event_id, epoch_ms(ts) AS ms,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER (PARTITION BY user_id
        |    ORDER BY epoch_ms(ts)
        |    RANGE BETWEEN 3600000 PRECEDING AND CURRENT ROW) AS BIGINT) AS win_cents
        |FROM events ORDER BY user_id, event_id""".stripMargin,
    "ts_percentiles" ->
      """SELECT date_trunc('hour', ts) AS bucket, count(*) AS n,
        |  quantile_cont(value, 0.5) AS p50,
        |  quantile_cont(value, 0.95) AS p95,
        |  quantile_cont(value, 0.99) AS p99
        |FROM events GROUP BY 1 ORDER BY bucket""".stripMargin,
    // CAST the sum: DuckDB sum(BIGINT) returns HUGEINT, which lands as
    // a pandas OBJECT column in the driver's hasher while the Spark
    // dump is int64 — the round-16 adjudication: the only three
    // HUGEINT-emitting oracles on the board were exactly the
    // sum-emitting driver-red ids, with every value equal
    "rfm_segments" ->
      """WITH m AS (
        |  SELECT user_id, max(epoch_ms(ts)) AS last_ms, count(*) AS freq,
        |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
        |  FROM events GROUP BY user_id),
        |q AS (
        |  SELECT user_id, last_ms, freq, cents,
        |    CAST((row_number() OVER (ORDER BY last_ms DESC, user_id) - 1) * 4
        |      // count(*) OVER () + 1 AS BIGINT) AS r,
        |    CAST((row_number() OVER (ORDER BY freq DESC, user_id) - 1) * 4
        |      // count(*) OVER () + 1 AS BIGINT) AS f,
        |    CAST((row_number() OVER (ORDER BY cents DESC, user_id) - 1) * 4
        |      // count(*) OVER () + 1 AS BIGINT) AS m
        |  FROM m)
        |SELECT user_id, last_ms, freq, cents, r, f, m,
        |  CAST(r AS VARCHAR) || '-' || CAST(f AS VARCHAR) || '-' ||
        |    CAST(m AS VARCHAR) AS segment
        |FROM q ORDER BY user_id""".stripMargin,
    "event_transitions" ->
      """WITH p AS (
        |  SELECT event_type AS cur,
        |    lead(event_type, 1) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS nxt
        |  FROM events),
        |cnt AS (
        |  SELECT cur, nxt, count(*) AS n FROM p
        |  WHERE nxt IS NOT NULL GROUP BY 1, 2)
        |SELECT cur, nxt, n,
        |  round(CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY cur), 6) AS p
        |FROM cnt ORDER BY cur, nxt""".stripMargin,
    "event_paths" ->
      """WITH t AS (
        |  SELECT event_type AS t1,
        |    lead(event_type, 1) OVER w AS t2,
        |    lead(event_type, 2) OVER w AS t3
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |paths AS (
        |  SELECT t1 || '>' || t2 || '>' || t3 AS path, count(*) AS n
        |  FROM t WHERE t3 IS NOT NULL GROUP BY 1)
        |SELECT rank, path, n FROM (
        |  SELECT path, n, CAST(row_number() OVER (ORDER BY n DESC, path)
        |    AS BIGINT) AS rank FROM paths)
        |WHERE rank <= 20 ORDER BY rank""".stripMargin,
    "ts_anomaly" ->
      """WITH c AS (
        |  SELECT user_id, event_id, ts,
        |    CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events),
        |w AS (
        |  SELECT user_id, event_id, cents,
        |    count(*) OVER fr AS n_prev,
        |    CAST(sum(cents) OVER fr AS DOUBLE) AS s1,
        |    CAST(sum(cents * cents) OVER fr AS DOUBLE) AS s2
        |  FROM c
        |  WINDOW fr AS (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)),
        |scored AS (
        |  SELECT user_id, event_id, cents, n_prev,
        |    CASE WHEN n_prev >= 10 THEN
        |      CASE WHEN (s2 - s1 * s1 / n_prev) / (n_prev - 1) > 0 THEN
        |        round((cents - s1 / n_prev) /
        |          sqrt((s2 - s1 * s1 / n_prev) / (n_prev - 1)), 6)
        |      END
        |    END AS z
        |  FROM w)
        |SELECT user_id, event_id, cents, n_prev, z
        |FROM scored WHERE abs(z) > 3
        |ORDER BY user_id, event_id""".stripMargin,
    "ts_downsample" ->
      """WITH e AS (
        |  SELECT date_trunc('hour', ts) AS bucket,
        |    CAST(round(value * 100) AS BIGINT) AS cents,
        |    epoch_ms(ts) * 4194304 + event_id AS k
        |  FROM events)
        |SELECT bucket, arg_min(cents, k) AS open_cents, max(cents) AS high_cents,
        |  min(cents) AS low_cents, arg_max(cents, k) AS close_cents,
        |  count(*) AS n, CAST(sum(cents) AS BIGINT) AS vol_cents
        |FROM e GROUP BY 1 ORDER BY bucket""".stripMargin,
    "ts_gapfill" ->
      """WITH ev AS (
        |  SELECT user_id, date_trunc('hour', ts) AS bucket, value FROM events),
        |agg AS (
        |  SELECT user_id, bucket, count(*) AS n,
        |    CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v
        |  FROM ev GROUP BY 1, 2),
        |spans AS (
        |  SELECT user_id,
        |    unnest(generate_series(min(bucket), max(bucket), INTERVAL 1 HOUR)) AS bucket
        |  FROM ev GROUP BY user_id),
        |j AS (
        |  SELECT s.user_id, s.bucket, COALESCE(a.n, 0) AS n, a.v
        |  FROM spans s LEFT JOIN agg a
        |    ON a.user_id = s.user_id AND a.bucket = s.bucket)
        |SELECT user_id, bucket, n, v,
        |  last_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY bucket
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_filled
        |FROM j ORDER BY user_id, bucket""".stripMargin,
    "sort_global" ->
      "SELECT o_orderkey, o_totalprice, o_orderdate FROM orders ORDER BY o_totalprice DESC, o_orderkey",
    "topk" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 10""".stripMargin,
    "setop_union" ->
      """SELECT c_nationkey AS nk FROM customer UNION SELECT s_nationkey FROM supplier ORDER BY nk""",
    "setop_except" ->
      """SELECT c_custkey AS k FROM customer WHERE c_custkey < 100
        |EXCEPT SELECT o_custkey FROM orders ORDER BY k""".stripMargin,
    "setop_intersect" ->
      """SELECT c_custkey AS k FROM customer WHERE c_custkey < 100
        |INTERSECT SELECT o_custkey FROM orders ORDER BY k""".stripMargin,
    "fn_string" ->
      """SELECT p_partkey, upper(p_name) AS up, lower(p_brand) AS lo,
        |  substring(p_name, 1, 4) AS sub4, length(p_name) AS len,
        |  trim('  ' || p_name || '  ') AS trimmed, lpad(p_brand, 10, '*') AS padded,
        |  regexp_replace(p_name, 'a', 'X', 'g') AS rexed
        |FROM part ORDER BY p_partkey""".stripMargin,
    "fn_date" ->
      """SELECT o_orderkey, year(o_orderdate) AS yr, month(o_orderdate) AS mo,
        |  day(o_orderdate) AS dom, date_trunc('month', o_orderdate) AS mon_start,
        |  date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS days_since,
        |  o_orderdate + INTERVAL 30 DAY AS plus30, epoch_ms(o_orderdate) AS epoch_ms
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "fn_math" ->
      """SELECT l_orderkey, l_linenumber, abs(l_discount - 0.05) AS abs_d,
        |  CAST(round(l_tax * 100) AS BIGINT) AS tax_pct, CAST(floor(l_quantity) AS BIGINT) AS fl,
        |  CAST(ceil(l_quantity) AS BIGINT) AS ce, sqrt(l_quantity) AS rt,
        |  CAST(l_quantity AS BIGINT) % 7 AS m7
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "fn_cond" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_totalprice > 300000 THEN 'big'
        |       WHEN o_totalprice > 100000 THEN 'mid' ELSE 'small' END AS bucket,
        |  coalesce(nullif(o_orderstatus,'P'), 'PENDING') AS st
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "fn_json" ->
      """SELECT event_id, json_extract_string(props, '$.k') AS k_str,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
        |  to_json(struct_pack(event_id := event_id, user_id := user_id)) AS j
        |FROM events ORDER BY event_id""".stripMargin,
    "fn_array" ->
      """SELECT doc_id, len(string_split(text, ' ')) AS n_words,
        |  string_split(text, ' ')[1] AS first_word,
        |  list_contains(string_split(text, ' '), 'spark') AS has_spark,
        |  array_to_string(list_sort(list_distinct(string_split(text, ' '))), ',') AS uniq_words
        |FROM documents ORDER BY doc_id""".stripMargin,
    "fn_regex" ->
      """SELECT doc_id,
        |  regexp_extract(text, '([a-z]+) ([a-z]+)', 2) AS second_word,
        |  regexp_replace(text, 'spark', 'SPARK', 'g') AS replaced,
        |  len(regexp_extract_all(text, 'spark')) AS n_spark,
        |  regexp_matches(text, 'table .*scan') AS has_pattern
        |FROM documents ORDER BY doc_id""".stripMargin,
    "fn_hof" ->
      """SELECT doc_id,
        |  array_to_string(list_transform(string_split(text,' '), w -> upper(w)), ',') AS upper_words,
        |  len(list_filter(string_split(text,' '), w -> length(w) > 4)) AS n_long,
        |  len(list_filter(string_split(text,' '), w -> w = 'spark')) > 0 AS has_spark,
        |  len(list_filter(string_split(text,' '), w -> length(w) > 10)) = 0 AS all_short,
        |  CAST(list_sum(list_transform(string_split(text,' '), w -> length(w))) AS DOUBLE) AS len_sum,
        |  array_to_string(list_transform(range(1, len(string_split(text,' ')) + 1),
        |    i -> CASE WHEN i < len(string_split(text,' '))
        |         THEN string_split(text,' ')[i] || '-' || string_split(text,' ')[i+1]
        |         ELSE string_split(text,' ')[i] END), ',') AS zipped
        |FROM documents ORDER BY doc_id""".stripMargin,
    "fn_hash" ->
      """SELECT doc_id, md5(text) AS h_md5, sha256(text) AS h_sha256
        |FROM documents ORDER BY doc_id""".stripMargin,
    "fn_interval" ->
      """SELECT o_orderkey,
        |  o_orderdate + INTERVAL '1 year 2 months' AS plus_1y2m,
        |  o_orderdate - INTERVAL '3 months' AS minus_3m,
        |  o_orderdate + INTERVAL '10 days 5 hours 30 minutes 1.5 seconds' AS plus_dt,
        |  date_diff('day', o_orderdate, o_orderdate + INTERVAL '1 year') AS days_plus_1y
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "subq_scalar" -> subqScalarSql,
    "subq_in" -> subqInSql,
    "stream_session" ->
      """WITH marked AS (
        |  SELECT user_id, ts, value,
        |    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |              >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
        |  FROM events),
        |sessioned AS (
        |  SELECT user_id, ts, value,
        |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts
        |                   ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM marked)
        |SELECT user_id, min(ts) AS sess_start, count(*) AS n,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
        |FROM sessioned GROUP BY user_id, sid ORDER BY user_id, sess_start""".stripMargin,
    "stream_tumble" ->
      """SELECT date_trunc('hour', ts) AS bucket, count(*) AS n,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
        |FROM events GROUP BY 1 ORDER BY bucket""".stripMargin,
    "stream_join" ->
      """SELECT c.user_id, c.event_id AS click_id, e.event_id AS err_id
        |FROM events c JOIN events e
        |  ON c.user_id = e.user_id
        | AND c.event_type = 'click' AND e.event_type = 'error'
        | AND e.ts >= c.ts AND e.ts <= c.ts + INTERVAL 60 MINUTE
        |ORDER BY 1, 2, 3""".stripMargin,
    "stream_join_outer" ->
      """SELECT c.user_id, c.event_id AS click_id, e.event_id AS err_id
        |FROM (SELECT * FROM events WHERE event_type = 'click') c
        |LEFT JOIN (SELECT * FROM events WHERE event_type = 'error') e
        |  ON c.user_id = e.user_id
        | AND e.ts >= c.ts AND e.ts <= c.ts + INTERVAL 60 MINUTE
        |ORDER BY 1, 2, 3""".stripMargin,
    "stream_sliding" ->
      """WITH expanded AS (
        |  SELECT to_timestamp(CAST(floor(epoch(ts)/1800)*1800 AS BIGINT))::TIMESTAMP
        |           - k * INTERVAL 30 MINUTE AS bucket,
        |         value
        |  FROM events CROSS JOIN (SELECT unnest([0, 1]) AS k))
        |SELECT bucket, count(*) AS n,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
        |FROM expanded GROUP BY bucket ORDER BY bucket""".stripMargin,
    "win_first" ->
      """SELECT user_id, event_id, value,
        |  first_value(value) OVER w AS first_v,
        |  last_value(value) OVER w AS last_v,
        |  nth_value(value, 2) OVER w AS second_v
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY event_id
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY user_id, event_id""".stripMargin,
    "q3_shipping" ->
      """SELECT l_orderkey, o_orderdate, o_orderpriority,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |           (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
        |    AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1995-03-15'
        |  AND l_shipdate > TIMESTAMP '1995-03-15'
        |GROUP BY 1, 2, 3
        |ORDER BY revenue DESC, o_orderdate, l_orderkey LIMIT 10""".stripMargin,
    "q5_local" ->
      """SELECT n_name,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |           (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q6_forecast" ->
      """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |                CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24""".stripMargin,
    "q10_returns" ->
      """SELECT c_custkey, c_name, n_name,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |           (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1996-07-01'
        |GROUP BY c_custkey, c_name, n_name
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,
    "q7_volume" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  year(l_shipdate) AS l_year,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |           (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM supplier
        |JOIN lineitem ON s_suppkey = l_suppkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |  AND ((n1.n_name = 'NATION_0' AND n2.n_name = 'NATION_1') OR
        |       (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_0'))
        |GROUP BY 1, 2, 3
        |ORDER BY supp_nation, cust_nation, l_year""".stripMargin,
    "q13_custdist" ->
      """SELECT c_count, count(*) AS custdist FROM (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer
        |  LEFT OUTER JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
        |  GROUP BY c_custkey)
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "q14_promo" ->
      """SELECT 100.0 * promo / total AS promo_revenue FROM (
        |  SELECT
        |    CAST(sum(CASE WHEN p_type = 'PROMO'
        |      THEN CAST(l_extendedprice AS DECIMAL(18,2)) *
        |           (1 - CAST(l_discount AS DECIMAL(18,2))) END) AS DOUBLE) AS promo,
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |             (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS total
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate < TIMESTAMP '1996-02-01')""".stripMargin,
    "q18_bigqty" ->
      """SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice, qty
        |FROM (SELECT l_orderkey, sum(l_quantity) AS qty
        |      FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 300)
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,
    "q2_mincost" ->
      """WITH supply AS (
        |  SELECT l_partkey, l_suppkey, s_name, s_acctbal, n_name,
        |    min((2 * CAST(round(l_extendedprice * 100) AS BIGINT) * 10000
        |         + CAST(l_quantity AS BIGINT))
        |      // (2 * CAST(l_quantity AS BIGINT))) AS unit_cost
        |  FROM lineitem
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  WHERE r_name = 'EUROPE'
        |  GROUP BY 1, 2, 3, 4, 5)
        |SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
        |  CAST(unit_cost AS BIGINT) AS unit_cost_e6
        |FROM supply
        |JOIN (SELECT l_partkey, min(unit_cost) AS min_cost
        |      FROM supply GROUP BY 1) USING (l_partkey)
        |JOIN part ON l_partkey = p_partkey
        |WHERE unit_cost = min_cost AND p_size <= 15 AND p_type = 'LARGE'
        |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100""".stripMargin,
    "q4_priority" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-07-01'
        |  AND o_orderdate < TIMESTAMP '1996-10-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey
        |                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q8_share" ->
      """SELECT year(o_orderdate) AS o_year,
        |  CAST(sum(CASE WHEN n2.n_name = 'NATION_2'
        |    THEN CAST(l_extendedprice AS DECIMAL(18,2)) *
        |         (1 - CAST(l_discount AS DECIMAL(18,2))) END) AS DOUBLE) /
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |           (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS mkt_share
        |FROM part
        |JOIN lineitem ON p_partkey = l_partkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation n1 ON c_nationkey = n1.n_nationkey
        |JOIN region ON n1.n_regionkey = r_regionkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation n2 ON s_nationkey = n2.n_nationkey
        |WHERE p_type = 'ECONOMY' AND r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY 1 ORDER BY o_year""".stripMargin,
    "q9_profit" ->
      """SELECT n_name AS nation, year(o_orderdate) AS o_year,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |             (1 - CAST(l_discount AS DECIMAL(18,2))) -
        |           CAST(p_retailprice AS DECIMAL(18,2)) *
        |             CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_profit
        |FROM part
        |JOIN lineitem ON p_partkey = l_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN orders ON l_orderkey = o_orderkey
        |WHERE p_name LIKE '%red%'
        |GROUP BY 1, 2 ORDER BY nation, o_year DESC""".stripMargin,
    "q11_value" ->
      """WITH vals AS (
        |  SELECT l_partkey,
        |    sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |        CAST(l_quantity AS DECIMAL(18,2))) AS value
        |  FROM lineitem
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  WHERE n_name = 'NATION_0'
        |  GROUP BY 1)
        |SELECT l_partkey, CAST(value AS DOUBLE) AS value
        |FROM vals
        |CROSS JOIN (SELECT CAST(sum(value) AS DOUBLE) AS total,
        |                   count(*) AS nparts FROM vals)
        |WHERE CAST(value AS DOUBLE) * nparts * 2.0 > total * 3.0
        |ORDER BY value DESC, l_partkey""".stripMargin,
    "q12_late" ->
      """SELECT l_linestatus,
        |  count(*) FILTER (WHERE o_orderpriority IN ('1-URGENT', '2-HIGH'))
        |    AS high_line_count,
        |  count(*) FILTER (WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH'))
        |    AS low_line_count
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY
        |  AND l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin,
    "q15_topsupp" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |    sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |        (1 - CAST(l_discount AS DECIMAL(18,2)))) AS total_rev
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate < TIMESTAMP '1996-04-01'
        |  GROUP BY 1)
        |SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_revenue
        |FROM rev
        |JOIN supplier ON l_suppkey = s_suppkey
        |WHERE total_rev = (SELECT max(total_rev) FROM rev)
        |ORDER BY s_suppkey""".stripMargin,
    "q16_suppcnt" ->
      """SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
        |  count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#5'
        |  AND p_size IN (1, 10, 20, 30, 40, 50)
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY 1, 2, 3
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,
    "q17_smallqty" ->
      """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
        |  AS avg_yearly
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |WHERE p_brand = 'Brand#3'
        |  AND l_quantity < (SELECT 0.2 * avg(l2.l_quantity) FROM lineitem l2
        |                    WHERE l2.l_partkey = p_partkey)""".stripMargin,
    "q19_disjunct" ->
      """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |                (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
        |  AS revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_returnflag = 'N' AND (
        |  (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5
        |    AND l_quantity BETWEEN 1 AND 11) OR
        |  (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10
        |    AND l_quantity BETWEEN 10 AND 20) OR
        |  (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
        |    AND l_quantity BETWEEN 20 AND 30))""".stripMargin,
    "q20_excess" ->
      """SELECT s_suppkey, s_name, s_acctbal
        |FROM supplier
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE n_name = 'NATION_1'
        |  AND s_suppkey IN (
        |    SELECT pair.l_suppkey
        |    FROM (SELECT l_partkey, l_suppkey, sum(l_quantity) AS pair_qty
        |          FROM lineitem
        |          WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |            AND l_shipdate < TIMESTAMP '1997-01-01'
        |            AND l_partkey IN (SELECT p_partkey FROM part
        |                              WHERE p_name LIKE 'red%')
        |          GROUP BY 1, 2) pair
        |    JOIN (SELECT l_partkey, sum(l_quantity) AS part_qty
        |          FROM lineitem
        |          WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |            AND l_shipdate < TIMESTAMP '1997-01-01'
        |            AND l_partkey IN (SELECT p_partkey FROM part
        |                              WHERE p_name LIKE 'red%')
        |          GROUP BY 1) whole USING (l_partkey)
        |    WHERE pair_qty * 2 > part_qty)
        |ORDER BY s_suppkey""".stripMargin,
    "q21_waiting" ->
      """SELECT s_name, count(*) AS numwait
        |FROM lineitem l1
        |JOIN orders ON l1.l_orderkey = o_orderkey
        |JOIN supplier ON l1.l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE l1.l_returnflag = 'R' AND o_orderstatus = 'F'
        |  AND n_name = 'NATION_0'
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_returnflag = 'R')
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name LIMIT 20""".stripMargin,
    "q22_balance" ->
      """WITH base AS (
        |  SELECT * FROM customer
        |  WHERE c_mktsegment IN ('AUTOMOBILE', 'BUILDING', 'MACHINERY'))
        |SELECT c_mktsegment, count(*) AS numcust,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
        |FROM base
        |CROSS JOIN (SELECT sum(CAST(c_acctbal AS DECIMAL(18,2))) AS possum,
        |                   count(*) AS poscnt
        |            FROM base WHERE c_acctbal > 0)
        |WHERE CAST(c_acctbal AS DECIMAL(18,2)) * poscnt > possum
        |  AND c_custkey NOT IN (SELECT o_custkey FROM orders
        |                        WHERE o_totalprice > 300000)
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "win_ntile" ->
      """WITH t AS (
        |  SELECT c_mktsegment, c_custkey, c_acctbal,
        |    ntile(4) OVER w AS quartile,
        |    row_number() OVER w AS rn,
        |    count(*) OVER (PARTITION BY c_mktsegment) AS n
        |  FROM customer
        |  WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey))
        |SELECT c_mktsegment, c_custkey, c_acctbal, quartile,
        |  quartile = (CASE WHEN rn <= (n % 4) * (n // 4 + 1)
        |    THEN (rn - 1) // (n // 4 + 1) + 1
        |    ELSE (n % 4) + (rn - (n % 4) * (n // 4 + 1) - 1)
        |         // greatest(n // 4, 1) + 1 END) AS ntile_parity
        |FROM t ORDER BY c_mktsegment, c_custkey""".stripMargin,
    "topk_group" ->
      """SELECT o_orderpriority, o_orderkey, o_totalprice, rk FROM (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |                       ORDER BY o_totalprice DESC, o_orderkey) AS rk
        |  FROM orders)
        |WHERE rk <= 3 ORDER BY o_orderpriority, rk""".stripMargin,
    "agg_mode" ->
      """SELECT l_returnflag, mode_qty, n_occurrences FROM (
        |  SELECT l_returnflag, l_quantity AS mode_qty, count(*) AS n_occurrences,
        |    row_number() OVER (PARTITION BY l_returnflag
        |                       ORDER BY count(*) DESC, l_quantity) AS rk
        |  FROM lineitem GROUP BY l_returnflag, l_quantity)
        |WHERE rk = 1 ORDER BY l_returnflag""".stripMargin,
    // Count-Min replay (round 15 — graduated once the cell hash moved
    // to the portable 56-bit md5 idiom): the grid is a pure function of
    // the key multiset, so DuckDB rebuilds every (row, cell) counter
    // from the per-key counts, probes the exact top-10's cells, and
    // takes the min — estimate, bound arithmetic and flag all mirrored
    "agg_heavyhitters" ->
      """WITH kc AS (
        |  SELECT user_id, count(*) AS c FROM events GROUP BY user_id),
        |n AS (SELECT CAST(sum(c) AS BIGINT) AS total FROM kc),
        |cellmap AS (
        |  SELECT r.r, kc.user_id, kc.c,
        |    CAST('0x' || substring(md5(r.r || ':' || kc.user_id), 1, 14) AS BIGINT) % 1024 AS cell
        |  FROM kc CROSS JOIN range(4) r(r)),
        |grid AS (
        |  SELECT r, cell, CAST(sum(c) AS BIGINT) AS cnt
        |  FROM cellmap GROUP BY r, cell),
        |top AS (
        |  SELECT user_id, c AS exact_n,
        |    CAST(row_number() OVER (ORDER BY c DESC, user_id) AS BIGINT) AS rank
        |  FROM kc ORDER BY c DESC, user_id LIMIT 10),
        |est AS (
        |  SELECT t.rank, t.user_id, t.exact_n, min(g.cnt) AS est_n
        |  FROM top t
        |  JOIN cellmap m ON m.user_id = t.user_id
        |  JOIN grid g ON g.r = m.r AND g.cell = m.cell
        |  GROUP BY t.rank, t.user_id, t.exact_n)
        |SELECT rank, user_id, exact_n, est_n,
        |  (est_n >= exact_n AND
        |   est_n <= exact_n + 4 * CAST(ceil(total * 2.718281828 / 1024) AS BIGINT)) AS within_bound
        |FROM est CROSS JOIN n ORDER BY rank""".stripMargin
  )
}
