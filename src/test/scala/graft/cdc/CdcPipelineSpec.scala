package graft.cdc

import graft.SparkSpec
import org.apache.spark.sql.types._
import java.nio.file.Files

/** §3.2 lifecycle: snapshot → stream handoff with overlap idempotence. */
class CdcPipelineSpec extends SparkSpec {

  private val feedSchema = StructType(Seq(
    StructField("id", LongType),
    StructField("value", DoubleType),
    StructField("op", StringType),
    StructField("scn", LongType)))

  test("snapshot state + change stream converge to the full-history fold") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("pipe")
    val changeDir = dir.resolve("changes"); Files.createDirectories(changeDir)
    val base = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("id", "value")

    // change events: update id=1, delete id=2, insert id=4 (scn > 100),
    // plus a LATE REPLAY of id=3 at scn=50 that must lose to the snapshot
    val lines = Seq(
      """{"id":1,"value":11.0,"op":"u","scn":101}""",
      """{"id":2,"value":20.0,"op":"d","scn":102}""",
      """{"id":4,"value":40.0,"op":"c","scn":103}""",
      """{"id":3,"value":999.0,"op":"u","scn":50}""")
    Files.write(changeDir.resolve("c0.json"), String.join("\n", lines: _*).getBytes)

    val h = CdcPipeline.start(
      s, base, keys = Seq("id"), snapshotScn = 100L,
      changeDir = changeDir.toString, feedSchema = feedSchema,
      statePath = dir.resolve("state").toString,
      checkpointDir = dir.resolve("chk").toString)
    assert(h.initialState.count() == 3) // snapshot materialized first
    h.stream.awaitTermination()

    val state = Stream.readCurrentState(s, dir.resolve("state").toString)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Double]("value")).toMap
    assert(state == Map(1L -> 11.0, 3L -> 30.0, 4L -> 40.0))
  }

  test("restart does not re-apply the snapshot: folded changes survive") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("piper")
    val changeDir = dir.resolve("changes"); Files.createDirectories(changeDir)
    val base = Seq((1L, 10.0), (2L, 20.0)).toDF("id", "value")
    Files.write(changeDir.resolve("c0.json"), String.join("\n",
      """{"id":1,"value":11.0,"op":"u","scn":101}""",
      """{"id":2,"value":20.0,"op":"d","scn":102}""").getBytes)
    def run() = CdcPipeline.start(
      s, base, keys = Seq("id"), snapshotScn = 100L,
      changeDir = changeDir.toString, feedSchema = feedSchema,
      statePath = dir.resolve("state").toString,
      checkpointDir = dir.resolve("chk").toString)
    run().stream.awaitTermination()
    def current() = Stream.readCurrentState(s, dir.resolve("state").toString)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Double]("value")).toMap
    assert(current() == Map(1L -> 11.0))
    // restart with the SAME paths and a new change file: the checkpoint
    // skips committed files, so re-writing the snapshot here would revert
    // id=1 and resurrect deleted id=2 — the state must instead carry on
    Files.write(changeDir.resolve("c1.json"), String.join("\n",
      """{"id":3,"value":30.0,"op":"c","scn":103}""").getBytes)
    val h2 = run()
    h2.stream.awaitTermination()
    assert(current() == Map(1L -> 11.0, 3L -> 30.0),
      "restart lost folded changes or resurrected a deleted key")
    // initialState on resume reflects the CURRENT state, not the snapshot
    val init = h2.initialState.collect().map(_.getAs[Long]("id")).toSet
    assert(!init.contains(2L))
  }

  test("boundary-SCN overlap is idempotent and deterministically stream-wins") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("pipeb")
    val changeDir = dir.resolve("changes"); Files.createDirectories(changeDir)
    val base = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("id", "value")

    // events AT the snapshot SCN (=100): a redelivered update of id=1
    // whose after-image equals the snapshot row (consistent source —
    // must be a no-op), and a delete of id=2 that a drifted snapshot
    // still contains (the stream, being the log of record, must win the
    // tie and remove the row — never a partition-order coin flip)
    val lines = Seq(
      """{"id":1,"value":10.0,"op":"u","scn":100}""",
      """{"id":2,"value":20.0,"op":"d","scn":100}""")
    Files.write(changeDir.resolve("c0.json"), String.join("\n", lines: _*).getBytes)

    val h = CdcPipeline.start(
      s, base, keys = Seq("id"), snapshotScn = 100L,
      changeDir = changeDir.toString, feedSchema = feedSchema,
      statePath = dir.resolve("state").toString,
      checkpointDir = dir.resolve("chk").toString)
    h.stream.awaitTermination()

    val state = Stream.readCurrentState(s, dir.resolve("state").toString)
      .collect()
      .map(r => r.getAs[Long]("id") ->
        ((r.getAs[Double]("value"), r.getAs[String]("op"), r.getAs[Int](CdcPipeline.SrcRankCol))))
      .toMap
    // id=1: value unchanged, but provenance shows the STREAM row won the tie
    assert(state(1L) == ((10.0, "u", 1)))
    // id=2: boundary delete applied; id=3: untouched snapshot row
    assert(!state.contains(2L))
    assert(state(3L) == ((30.0, "r", 0)))
  }
}
