package graft.cdc

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Incremental aggregate-view maintenance (SURVEY.md §2: engine addition;
  * round-5 backlog item 6): `Ops.incrementalAgg` must (a) equal the full
  * recompute, and (b) do it with a delta-proportional plan — the history
  * feed is never rescanned, and the state is probed through a BROADCAST
  * semi-join on the delta's keys (no shuffle of the full state).
  */
case class IncEv(scn: Long, id: Long, op: String, grp: String, value: Double)

class IncrementalAggSpec extends SparkSpec {
  private type E = IncEv
  private def E(scn: Long, id: Long, op: String, grp: String, value: Double) =
    IncEv(scn, id, op, grp, value)

  private val hist = (0 until 120).map { i =>
    val op = if (i % 13 == 7) "d" else if (i % 5 == 0) "c" else "u"
    E(i.toLong, (i % 20).toLong, op, s"g${i % 4}", (i * 7 % 300) / 4.0)
  }
  // the delta touches a few keys: updates, a delete, a brand-new key
  private val delta = Seq(
    E(200, 1, "u", "g2", 55.25), E(201, 2, "d", "g0", 0.0),
    E(202, 99, "c", "g3", 7.75), E(203, 1, "u", "g0", 11.5))

  private def viewOf(df: org.apache.spark.sql.DataFrame): Map[String, (Long, Long)] =
    df.collect().map(r => r.getAs[String]("grp") ->
      ((r.getAs[Long]("cnt"), r.getAs[Long]("cents")))).toMap

  test("incremental view equals the full recompute (incl. deletes and new keys)") {
    val s = spark
    import s.implicits._
    val state0 = Ops.applyChanges(hist.toDF(), keys = Seq("id"), ordering = Seq("scn"))
    val inc = Ops.incrementalAgg(state0, delta.toDF(), keys = Seq("id"),
      ordering = Seq("scn"), groupCol = "grp", valueCol = "value")
    val full = Ops.applyChanges((hist ++ delta).toDF(), keys = Seq("id"), ordering = Seq("scn"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("cnt"), sum(round(col("value") * 100).cast("long")).as("cents"))
    assert(viewOf(inc) == viewOf(full))
    assert(viewOf(inc).nonEmpty)
  }

  test("delta plan touches only the delta: no history scan, broadcast semi-join probe of the state") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("incagg")
    dir.toFile.deleteOnExit()
    val histPath = dir.resolve("hist").toString
    val statePath = dir.resolve("state").toString
    val deltaPath = dir.resolve("delta").toString
    hist.toDF().write.parquet(histPath)
    Ops.applyChanges(s.read.parquet(histPath), keys = Seq("id"), ordering = Seq("scn"))
      .write.parquet(statePath)
    delta.toDF().write.parquet(deltaPath)
    val inc = Ops.incrementalAgg(
      s.read.parquet(statePath), s.read.parquet(deltaPath),
      keys = Seq("id"), ordering = Seq("scn"), groupCol = "grp", valueCol = "value")
    // force the final adaptive plan, then inspect it
    assert(inc.collect().nonEmpty)
    val plan = inc.queryExecution.executedPlan.toString
    assert(!plan.contains("hist"), s"history must not appear in the maintenance plan:\n$plan")
    assert(plan.contains("state") && plan.contains("delta"), plan)
    // the state probe is a broadcast LeftSemi on the delta keys — the
    // 100 TB shape (bucket/partition-prunable probe, no full-state shuffle)
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"), plan)
    // and the incremental view matches the recompute on the same inputs
    val full = Ops.applyChanges(
      s.read.parquet(histPath).unionByName(s.read.parquet(deltaPath)),
      keys = Seq("id"), ordering = Seq("scn"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("cnt"), sum(round(col("value") * 100).cast("long")).as("cents"))
    assert(viewOf(inc) == viewOf(full))
  }
}
