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

  test("ts_anomaly: planted spike flagged with the hand-computed z; cold keys and flat windows never flag") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("anomaly").toString
    // user 1: 20 alternating baseline values then one wild spike;
    // user 2: a wild value with only 5 prior events (cold key);
    // user 3: 15 CONSTANT values then a spike (zero variance — z is
    // undefined and must not be emitted, not infinity-flagged)
    val base = (0 until 20).map(i =>
      (i.toLong, f"2024-01-01 00:${i}%02d:00", 1L, "m",
        if (i % 2 == 0) 1.00 else 2.00, "{}"))
    val spike = Seq((20L, "2024-01-01 00:20:00", 1L, "m", 50.00, "{}"))
    val cold = (0 until 5).map(i =>
      (30L + i, f"2024-01-01 01:${i}%02d:00", 2L, "m", 1.00, "{}")) ++
      Seq((35L, "2024-01-01 01:05:00", 2L, "m", 999.00, "{}"))
    val flat = (0 until 15).map(i =>
      (40L + i, f"2024-01-01 02:${i}%02d:00", 3L, "m", 5.00, "{}")) ++
      Seq((55L, "2024-01-01 02:15:00", 3L, "m", 500.00, "{}"))
    (base ++ spike ++ cold ++ flat)
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", col("ts").cast("timestamp_ntz"))
      .write.parquet(s"$dir/events.parquet")
    val got = Queries.queries("ts_anomaly")(s, dir)
      .as[(Long, Long, Long, Long, Double)].collect()
    // hand-computed z for the spike: prior 20 cents values alternate
    // 100/200 -> s1=3000, s2=500000, n=20; mu=150,
    // var=(500000-450000)/19, z=(5000-150)/sqrt(var)
    val varr = (500000.0 - 3000.0 * 3000.0 / 20) / 19
    val expZ = BigDecimal((5000.0 - 150.0) / math.sqrt(varr))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // the flat-window user's constant prefix must also not flag the
    // spike at event 55 (sigma = 0 -> z is NULL, filtered)
    assert(got.toSeq == Seq((1L, 20L, 5000L, 20L, expZ)),
      s"expected exactly the planted spike, got ${got.toSeq}")
  }

  test("event_transitions/event_paths: planted journey gives exact probabilities and trigram counts") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("journeys").toString
    // user 1 walks a,b,a,b,c; user 2 walks a,b,c — transitions pool
    // across users, probabilities condition on the current type
    val ev = Seq(
      (0L, "2024-01-01 00:00:00", 1L, "a"), (1L, "2024-01-01 00:01:00", 1L, "b"),
      (2L, "2024-01-01 00:02:00", 1L, "a"), (3L, "2024-01-01 00:03:00", 1L, "b"),
      (4L, "2024-01-01 00:04:00", 1L, "c"),
      (5L, "2024-01-01 00:00:00", 2L, "a"), (6L, "2024-01-01 00:01:00", 2L, "b"),
      (7L, "2024-01-01 00:02:00", 2L, "c"))
    ev.map { case (id, ts, u, t) => (id, ts, u, t, 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", col("ts").cast("timestamp_ntz"))
      .write.parquet(s"$dir/events.parquet")
    val trans = Queries.queries("event_transitions")(s, dir)
      .as[(String, String, Long, Double)].collect()
      .map(t => (t._1, t._2) -> (t._3, t._4)).toMap
    // a->b 3 of 3; b->a 1 of 3, b->c 2 of 3 (rounded 6)
    assert(trans == Map(
      ("a", "b") -> (3L, 1.0),
      ("b", "a") -> (1L, 0.333333),
      ("b", "c") -> (2L, 0.666667)), trans)
    val paths = Queries.queries("event_paths")(s, dir)
      .as[(Long, String, Long)].collect().map(t => t._2 -> t._3).toMap
    // trigrams: u1 a>b>a, b>a>b, a>b>c; u2 a>b>c
    assert(paths == Map("a>b>c" -> 2L, "a>b>a" -> 1L, "b>a>b" -> 1L), paths)
  }

  test("ts_percentiles: linear interpolation exact on 1..100; rfm_segments: planted users hit known quartiles") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("pctl").toString
    // one hourly bucket holding values 1..100, a second with a single
    // value; four users with strictly ordered recency/frequency/spend
    val bucketEvents = (1 to 100).map(i =>
      (i.toLong, f"2024-01-01 00:${i % 60}%02d:${i / 60}%02d", (i % 4).toLong + 10L, "m", i.toDouble, "{}"))
    val single = Seq((200L, "2024-01-01 01:00:00", 10L, "m", 7.0, "{}"))
    (bucketEvents ++ single)
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", col("ts").cast("timestamp_ntz"))
      .write.parquet(s"$dir/events.parquet")
    val p = Queries.queries("ts_percentiles")(s, dir)
      .withColumn("h", hour(col("bucket"))).collect()
      .map(r => r.getAs[Int]("h") ->
        (r.getAs[Long]("n"), r.getAs[Double]("p50"),
          r.getAs[Double]("p95"), r.getAs[Double]("p99"))).toMap
    // 1..100: quantile_cont(q) = 1 + q*99 exactly
    assert(p(0) == ((100L, 50.5, 95.05, 99.01)), p(0))
    assert(p(1) == ((1L, 7.0, 7.0, 7.0)), "single-value bucket: all pctls equal it")
    // rfm on four users whose three metrics all order 10 < 11 < 12 < 13
    // EXCEPT recency which user 10 wins via the extra hour-1 event
    val rfm = Queries.queries("rfm_segments")(s, dir).collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("r"), r.getAs[Long]("f"), r.getAs[Long]("m"))).toMap
    // frequencies: user10 has 26 events (25 + the single), 11:25, 12:25, 13:25
    // -> f quartiles by (freq desc, id): 10->1, 11->2, 12->3, 13->4
    assert(rfm(10L)._2 == 1L && rfm(11L)._2 == 2L &&
      rfm(12L)._2 == 3L && rfm(13L)._2 == 4L, rfm)
    // recency: user 10 alone has the hour-1 event -> r=1
    assert(rfm(10L)._1 == 1L, rfm)
    // four users, ntile(4): each metric assigns each user a distinct
    // quartile — a 1:1 map
    Seq(1, 2).foreach { i =>
      val vals = rfm.values.map(t => i match { case 1 => t._1; case 2 => t._2 }).toSeq.sorted
      assert(vals == Seq(1L, 2L, 3L, 4L), s"metric $i quartiles: $rfm")
    }
  }

  test("rfm quartile formula pins its remainder distribution (n=6 -> bucket sizes 2,1,2,1)") {
    // Round 16: ntile's remainder placement proved engine-version-
    // sensitive, so the quartile is the explicit (rn-1)*4 div n + 1
    // formula. This pins the formula's own remainder behavior at a
    // non-divisible n so a regression back to any engine's ntile
    // (sizes 2,2,1,1) fails loudly.
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("rfm6").toString
    (10 to 15).map(u =>
      (u.toLong, s"2024-01-01 00:0${u - 10}:00", u.toLong, "m", u.toDouble, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", col("ts").cast("timestamp_ntz"))
      .write.parquet(s"$dir/events.parquet")
    val rfm = Queries.queries("rfm_segments")(s, dir).collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("r")).toMap
    // recency order (last_ms desc, user_id): 15,14,13,12,11,10 ->
    // quartiles via (rn-1)*4 div 6 + 1 = 1,1,2,3,3,4
    assert(rfm == Map(15L -> 1L, 14L -> 1L, 13L -> 2L, 12L -> 3L,
      11L -> 3L, 10L -> 4L), rfm)
  }
}
