package graft.rel

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** ts_gapfill semantics on a planted series — the oracle differential
  * proves cross-engine arithmetic; this pins WHAT gap-fill means:
  * dense buckets over each key's span, zero counts in gaps, and
  * last-observation-carried-forward values.
  */
class TimeSeriesSpec extends SparkSpec {

  test("ts_gapfill: dense span, zero-count gaps, LOCF fills, span bounds exact") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("gapfill").toString
    // user 1: events at hours 0, 0, 3 (gap at 1-2); user 2: single event
    Seq(
      (0L, "2024-01-01 00:10:00", 1L, "a", 10.00, "{}"),
      (1L, "2024-01-01 00:50:00", 1L, "a", 2.50, "{}"),
      (2L, "2024-01-01 03:05:00", 1L, "a", 7.25, "{}"),
      (3L, "2024-01-02 10:00:00", 2L, "b", 1.00, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", col("ts").cast("timestamp_ntz"))
      .write.parquet(s"$dir/events.parquet")
    val rows = Queries.queries("ts_gapfill")(s, dir)
      .select(col("user_id"), hour(col("bucket")).as("h"), col("n"),
        col("v"), col("v_filled"))
      .as[(Long, Int, Long, Option[Double], Option[Double])].collect()
    val u1 = rows.filter(_._1 == 1L).sortBy(_._2)
    // dense hourly span 0..3 — exactly 4 buckets, gaps included
    assert(u1.map(_._2).toSeq == Seq(0, 1, 2, 3), u1.toSeq)
    assert(u1.map(_._3).toSeq == Seq(2L, 0L, 0L, 1L), "counts with zero gaps")
    assert(u1.map(_._4).toSeq ==
      Seq(Some(12.50), None, None, Some(7.25)), "raw sums, null in gaps")
    assert(u1.map(_._5).toSeq ==
      Seq(Some(12.50), Some(12.50), Some(12.50), Some(7.25)),
      "LOCF carries the last seen value across the gap")
    // a single-event key spans exactly one bucket
    val u2 = rows.filter(_._1 == 2L)
    assert(u2.length == 1 && u2(0)._3 == 1L && u2(0)._5 == Some(1.00))
  }
}
