package graft.rel

import graft.{SparkEntry, SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Accuracy contracts for the sketch-based aggregations the driver can
  * only rows-check (sketch internals are engine-specific): HLL distinct
  * counts within its published error bound, t-digest percentiles within
  * a small relative error of the exact sort-based form.
  */
class ApproxSpec extends SparkSpec {

  test("approx_count_distinct within HLL error bound of exact") {
    val li = Tables(spark, sf("sf0.001")).lineitem
    val row = li.agg(
      countDistinct(col("l_partkey")).as("exact"),
      approx_count_distinct(col("l_partkey")).as("approx")).collect()(0)
    val exact = row.getAs[Long]("exact").toDouble
    val approx = row.getAs[Long]("approx").toDouble
    // default rsd = 5%; allow 3 sigma
    assert(math.abs(approx - exact) / exact < 0.15,
      s"HLL too far off: exact=$exact approx=$approx")
  }

  test("agg_stats matches closed-form two-pass moments") {
    val s = spark
    val li = Tables(s, sf("sf0.001")).lineitem
      .select(col("l_returnflag").as("f"),
        col("l_quantity").cast("double").as("q"),
        col("l_extendedprice").cast("double").as("p"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    val byFlag = li.groupBy(_._1)
    val got = SparkEntry.queries("agg_stats")(s, sf("sf0.001"))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    byFlag.foreach { case (flag, rows) =>
      val qs = rows.map(_._2); val ps = rows.map(_._3)
      val n = qs.length.toDouble
      val mq = qs.sum / n; val mp = ps.sum / n
      val varQ = qs.map(x => (x - mq) * (x - mq)).sum / (n - 1)
      val cov = qs.zip(ps).map { case (x, y) => (x - mq) * (y - mp) }.sum / (n - 1)
      val varP = ps.map(x => (x - mp) * (x - mp)).sum / (n - 1)
      val corrQP = cov / math.sqrt(varQ * varP)
      val (gSd, gVar, gCorr, gCov) = got(flag)
      // the query rounds to 6 decimals for oracle hash-stability, so
      // allow 5e-7 absolute (half an ulp of the rounding) on top of the
      // relative merge-noise tolerance
      def close(a: Double, b: Double) =
        math.abs(a - b) < 5.000001e-7 ||
          math.abs(a - b) / math.max(math.abs(b), 1e-9) < 1e-6
      assert(close(gVar, varQ), s"$flag var: $gVar vs $varQ")
      assert(close(gSd, math.sqrt(varQ)), s"$flag sd")
      assert(close(gCov, cov), s"$flag cov")
      assert(close(gCorr, corrQP), s"$flag corr")
    }
  }

  test("builtin approx_percentile (GK) within 5% of exact; sampled sketch within 10%") {
    val exact = SparkEntry.queries("agg_percentile")(spark, sf("sf0.001"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // the builtin mergeable-summary production call stays pinned here —
    // its internals are engine-opaque, so it can never sit in the
    // oracle-compared output (the agg_approx adjudication)
    val builtin = Tables(spark, sf("sf0.001")).lineitem
      .groupBy("l_returnflag")
      .agg(approx_percentile(col("l_quantity"), lit(0.5), lit(1000)).as("p"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // the portable deterministic-sample estimate the driver hash-checks
    val sampled = SparkEntry.queries("agg_approx_pct")(spark, sf("sf0.001"))
      .collect().map(r => r.getString(0) -> r.getAs[Double]("qty_p50")).toMap
    assert(exact.keySet == builtin.keySet && exact.keySet == sampled.keySet)
    exact.foreach { case (flag, e) =>
      assert(math.abs(builtin(flag) - e) / math.max(e, 1e-9) < 0.05,
        s"builtin p50($flag): exact=$e got=${builtin(flag)}")
      assert(math.abs(sampled(flag) - e) / math.max(e, 1e-9) < 0.10,
        s"sampled p50($flag): exact=$e got=${sampled(flag)}")
    }
  }

  test("in-query within_tol verdicts hold on both approx ids (the rows-only signal)") {
    // agg_approx / agg_approx_pct assert their own accuracy in a
    // deterministic `within_tol` column (the driver's rows-only check
    // sees it in the dumped parquet); pin it true at both small SFs.
    Seq("sf0.001", "sf0.01").foreach { scale =>
      Seq("agg_approx", "agg_approx_pct").foreach { id =>
        val rows = SparkEntry.queries(id)(spark, sf(scale)).collect()
        assert(rows.nonEmpty, s"$id at $scale returned no rows")
        rows.foreach { r =>
          assert(r.getAs[Boolean]("within_tol"), s"$id at $scale: $r")
        }
      }
    }
  }
}
