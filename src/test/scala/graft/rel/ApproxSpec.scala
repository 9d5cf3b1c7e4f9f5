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

  test("approx_percentile within 5% relative error of exact percentile") {
    val exact = SparkEntry.queries("agg_percentile")(spark, sf("sf0.001"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val approx = SparkEntry.queries("agg_approx_pct")(spark, sf("sf0.001"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(exact.keySet == approx.keySet)
    exact.foreach { case (flag, e) =>
      val a = approx(flag)
      assert(math.abs(a - e) / math.max(e, 1e-9) < 0.05,
        s"p50($flag): exact=$e approx=$a")
    }
  }
}
