package graft.cdc

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** DBLog-style chunked incremental snapshot: the merge must make
  * chunking invisible (result ≡ plain snapshot-then-apply), with the
  * interesting interleavings planted explicitly.
  */
class ChunkedSnapshotSpec extends SparkSpec {

  private def feedDf(rows: Seq[(Long, Long, String, String)]): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF("scn", "id", "op", "payload")
  }

  private def baseDf(rows: Seq[(Long, String)]): DataFrame = {
    val s = spark
    import s.implicits._
    Ops.snapshot(rows.toDF("id", "payload"), scn = 0L)
      .withColumn("scn", col("scn").cast("long"))
      .select("scn", "id", "op", "payload")
  }

  private def plainApply(base: DataFrame, feed: DataFrame): Map[Long, (Long, String, String)] =
    base.unionByName(feed)
      .groupBy("id")
      .agg(max_by(struct(col("scn"), col("op"), col("payload")),
        struct(col("scn"), col("op") =!= "r")).as("st"))
      .select(col("id"), col("st.scn"), col("st.op"), col("st.payload"))
      .filter(col("op") =!= "d")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2), r.getString(3)))).toMap

  private def chunked(base: DataFrame, feed: DataFrame, n: Int): Map[Long, (Long, String, String)] =
    Ops.chunkedSnapshot(base, feed, keyCol = "id", scnCol = "scn", opCol = "op", nChunks = n)
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("scn"), r.getAs[String]("op"), r.getAs[String]("payload")))).toMap

  test("planted interleavings: stale chunk rows superseded, embodied changes not duplicated") {
    // keys 0..9 in base; maxScn=100, nChunks=2 → keys 0-4 read at wm=50,
    // keys 5-9 at wm=100.
    val base = baseDf((0L to 9L).map(k => (k, s"base$k")))
    val feed = feedDf(Seq(
      (10L, 0L, "u", "early-update"),    // before wm(0)=50 → embodied by the chunk read
      (60L, 1L, "u", "late-update"),     // after wm(1)=50 → must supersede the chunk row
      (20L, 2L, "d", "gone"),            // deleted before its chunk read → absent
      (70L, 3L, "d", "gone-late"),       // deleted after its chunk read → still absent
      (30L, 4L, "d", "tmp"), (80L, 4L, "c", "recreated"), // delete then re-create
      (40L, 5L, "u", "v1"), (90L, 5L, "u", "v2"),         // two updates, both ≤ wm=100
      (100L, 6L, "u", "at-watermark"),   // change exactly AT its chunk's watermark
      (55L, 11L, "c", "born-live")))     // key not in base at all
    val expect = plainApply(base, feed)
    // sanity on the planted shape itself
    assert(expect(1L) == ((60L, "u", "late-update")))
    assert(!expect.contains(2L) && !expect.contains(3L))
    assert(expect(4L) == ((80L, "c", "recreated")))
    assert(expect(5L) == ((90L, "u", "v2")))
    assert(expect(6L) == ((100L, "u", "at-watermark")))
    assert(expect(11L) == ((55L, "c", "born-live")))
    assert(expect(7L) == ((0L, "r", "base7")), "untouched base row must survive as a read")
    for (n <- Seq(1, 2, 3, 8, 64))
      assert(chunked(base, feed, n) == expect, s"nChunks=$n diverged from the plain apply")
  }

  test("scn-0 live change beats the scn-0 base read deterministically") {
    val base = baseDf(Seq((1L, "base1"), (2L, "base2")))
    val feed = feedDf(Seq((0L, 1L, "u", "event-at-scn0")))
    val got = chunked(base, feed, 2)
    assert(got(1L) == ((0L, "u", "event-at-scn0")),
      "at equal scn the live change must outrank the snapshot read")
    assert(got(2L) == ((0L, "r", "base2")))
  }

  test("empty feed degenerates to the plain snapshot") {
    val base = baseDf(Seq((1L, "a"), (5L, "b")))
    val got = chunked(base, feedDf(Seq.empty[(Long, Long, String, String)]), 4)
    assert(got == Map(1L -> ((0L, "r", "a")), 5L -> ((0L, "r", "b"))))
  }

  test("snapshot-while-streaming: chunk reads injected into a LIVE materialize land the full-history fold") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("chunkstream")
    val in = dir.resolve("in"); java.nio.file.Files.createDirectories(in)
    val statePath = dir.resolve("state").resolve("t").toString
    val chk = dir.resolve("chk").toString
    // base keys 1..8; stream: update 1 (late, after its chunk read),
    // update 2 (early — embodied by its chunk read), delete 3 (late:
    // its read row must NOT resurrect it), create 9. maxScn=100,
    // nChunks=2 → wm(keys 1-4)=50, wm(keys 5-8)=100.
    val base = baseDf((1L to 8L).map(k => (k, s"base$k")))
    val feed = feedDf(Seq(
      (60L, 1L, "u", "late-update"),
      (20L, 2L, "u", "early-update"),
      (70L, 3L, "d", "gone"),
      (40L, 9L, "c", "born-live")))
    val reads = Ops.chunkReadEvents(base, feed,
      keyCol = "id", scnCol = "scn", opCol = "op", nChunks = 2)
      .collect().map(r => s"""{"scn":${r.getAs[Long]("scn")},"id":${r.getAs[Long]("id")},""" +
        s""""op":"r","payload":"${r.getAs[String]("payload")}"}""")
    def writeLines(name: String, lines: Seq[String]): Unit =
      java.nio.file.Files.write(in.resolve(name), lines.mkString("\n").getBytes)
    // stream events arrive FIRST (the stream never stops), reads trickle
    // in afterwards — including the id=3 read AFTER its delete
    writeLines("a-events.json", feed.collect().map(r =>
      s"""{"scn":${r.getAs[Long]("scn")},"id":${r.getAs[Long]("id")},""" +
        s""""op":"${r.getAs[String]("op")}","payload":"${r.getAs[String]("payload")}"}""").toSeq)
    writeLines("b-reads.json", reads.toSeq)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("scn", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("op", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("payload", org.apache.spark.sql.types.StringType)))
    val wire = s.readStream.schema(schema).option("maxFilesPerTrigger", 1)
      .json(in.toString)
      .withColumn("__rank", when(col("op") === "r", 0L).otherwise(1L))
    val q = Stream.materialize(wire, Seq("id"), Seq("scn", "__rank"), statePath, chk)
    q.awaitTermination()
    val got = Stream.readCurrentState(s, statePath)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[String]("payload")).toMap
    val expect = plainApply(base, feed).map { case (k, (_, _, p)) => k -> p }
    assert(got == expect, s"streamed incremental snapshot diverged: $got vs $expect")
    assert(got(1L) == "late-update" && got(2L) == "early-update")
    assert(!got.contains(3L), "a chunk read resurrected a deleted key")
    assert(got(9L) == "born-live" && got(8L) == "base8")
  }

  test("snapshot-while-streaming survives a restart: reads arrive while down, stale read replay can't regress") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("chunkrestart")
    val in = dir.resolve("in"); java.nio.file.Files.createDirectories(in)
    val statePath = dir.resolve("state").resolve("t").toString
    val chk = dir.resolve("chk").toString
    val base = baseDf((1L to 8L).map(k => (k, s"base$k")))
    val feed = feedDf(Seq(
      (60L, 1L, "u", "late-update"),
      (20L, 2L, "u", "early-update"),
      (70L, 3L, "d", "gone"),
      (40L, 9L, "c", "born-live")))
    val reads = Ops.chunkReadEvents(base, feed,
      keyCol = "id", scnCol = "scn", opCol = "op", nChunks = 2)
      .collect().map(r => s"""{"scn":${r.getAs[Long]("scn")},"id":${r.getAs[Long]("id")},""" +
        s""""op":"r","payload":"${r.getAs[String]("payload")}"}""")
    def writeLines(name: String, lines: Seq[String]): Unit =
      java.nio.file.Files.write(in.resolve(name), lines.mkString("\n").getBytes)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("scn", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("op", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("payload", org.apache.spark.sql.types.StringType)))
    def run(): Unit = {
      val wire = s.readStream.schema(schema).option("maxFilesPerTrigger", 1)
        .json(in.toString)
        .withColumn("__rank", when(col("op") === "r", 0L).otherwise(1L))
      val q = Stream.materialize(wire, Seq("id"), Seq("scn", "__rank"), statePath, chk)
      q.awaitTermination()
    }
    def state(): Map[Long, String] = Stream.readCurrentState(s, statePath)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[String]("payload")).toMap
    // phase 1: only the live stream has flowed; the query goes DOWN
    writeLines("a-events.json", feed.collect().map(r =>
      s"""{"scn":${r.getAs[Long]("scn")},"id":${r.getAs[Long]("id")},""" +
        s""""op":"${r.getAs[String]("op")}","payload":"${r.getAs[String]("payload")}"}""").toSeq)
    run()
    assert(state() == Map(1L -> "late-update", 2L -> "early-update", 9L -> "born-live"),
      "pre-restart state must be the pure stream fold")
    // phase 2: the chunk reads landed while the query was down; restart
    // from the same checkpoint folds ONLY the new files (no reprocessing)
    writeLines("b-reads.json", reads.toSeq)
    run()
    val expect = plainApply(base, feed).map { case (k, (_, _, p)) => k -> p }
    assert(state() == expect, s"post-restart fold diverged: ${state()} vs $expect")
    assert(!state().contains(3L), "a read arriving after restart resurrected a delete")
    // phase 3: an at-least-once channel REPLAYS the reads after another
    // restart — stale reads lose to everything they already lost to
    writeLines("c-reads-replay.json", reads.toSeq)
    run()
    assert(state() == expect, "replayed chunk reads must be idempotent across restarts")
  }

  test("IntegerType keys spanning a wide range don't overflow the chunk arithmetic") {
    val s = spark
    import s.implicits._
    // (key − min) · nChunks exceeds Int.MaxValue for the high key: a
    // 32-bit multiply wraps negative, the watermark goes negative, and
    // the untouched base row vanishes (the regression this pins)
    val base = Seq((0, "lo"), (500000000, "hi"))
      .toDF("id", "payload")
      .withColumn("scn", lit(0L)).withColumn("op", lit("r"))
    val feed = Seq((10L, 0, "u", "updated"))
      .toDF("scn", "id", "op", "payload")
    val got = Ops.chunkedSnapshot(base, feed,
        keyCol = "id", scnCol = "scn", opCol = "op", nChunks = 8)
      .collect().map(r => r.getAs[Int]("id") -> r.getAs[String]("payload")).toMap
    assert(got == Map(0 -> "updated", 500000000 -> "hi"),
      s"wide int key range mangled the chunk assignment: $got")
  }

  test("IntegerType keys spanning Int.MinValue..Int.MaxValue don't overflow") {
    val s = spark
    import s.implicits._
    // the SUBTRACTION itself wraps in 32-bit: (MaxValue − MinValue)
    // = 2³²−1 overflows int before any cast-to-long downstream of it
    // can help, as does the denominator (max − min + 1) — both must be
    // cast to long per-operand (the regression this pins; hash-derived
    // ids legitimately cover the whole int range)
    val base = Seq(
        (Int.MinValue, "lo"), (-1, "mid-lo"), (0, "mid-hi"),
        (Int.MaxValue, "hi"))
      .toDF("id", "payload")
      .withColumn("scn", lit(0L)).withColumn("op", lit("r"))
    val feed = Seq((10L, Int.MinValue, "u", "updated"))
      .toDF("scn", "id", "op", "payload")
    val got = Ops.chunkedSnapshot(base, feed,
        keyCol = "id", scnCol = "scn", opCol = "op", nChunks = 8)
      .collect().map(r => r.getAs[Int]("id") -> r.getAs[String]("payload")).toMap
    assert(got == Map(Int.MinValue -> "updated", -1 -> "mid-lo",
        0 -> "mid-hi", Int.MaxValue -> "hi"),
      s"full int key range mangled the chunk assignment: $got")
  }

  test("LongType keys spanning Long.MinValue..Long.MaxValue don't overflow (decimal path)") {
    val s = spark
    import s.implicits._
    // the long-cast fix alone is not enough at THIS span: (max − min + 1)
    // wraps to 0 in 64-bit (divide-by-zero) and (key − min) · nChunks
    // wraps negative — the arithmetic must run in DECIMAL(38,0) with
    // exact integer division (the regression this pins; 64-bit
    // hash-derived ids legitimately cover the whole long range)
    val base = Seq(
        (Long.MinValue, "lo"), (-1L, "mid-lo"), (0L, "mid-hi"),
        (Long.MaxValue, "hi"))
      .toDF("id", "payload")
      .withColumn("scn", lit(0L)).withColumn("op", lit("r"))
    val feed = Seq((10L, Long.MinValue, "u", "updated"))
      .toDF("scn", "id", "op", "payload")
    val got = Ops.chunkedSnapshot(base, feed,
        keyCol = "id", scnCol = "scn", opCol = "op", nChunks = 8)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[String]("payload")).toMap
    assert(got == Map(Long.MinValue -> "updated", -1L -> "mid-lo",
        0L -> "mid-hi", Long.MaxValue -> "hi"),
      s"full long key range mangled the chunk assignment: $got")
  }

  test("fixture equivalence: snapshot_chunked ≡ plain apply at sf0.001 for several chunkings") {
    val s = spark
    val dir = sf("sf0.001")
    val base = Ops.snapshot(
      graft.Tables(s, dir).customer.select(
        col("c_custkey").as("id"),
        lit(null).cast("timestamp").as("ts"),
        lit("snapshot").as("event_type"),
        col("c_acctbal").as("value"),
        col("c_name").as("props")),
      scn = 0L).withColumn("scn", col("scn").cast("long"))
    val feed = ChangeFeed.fromEvents(s, dir)
    def canon(df: DataFrame) = df
      .select("id", "scn", "op", "event_type", "value", "props")
      .collect().map(_.toSeq).toSet
    val plain = canon(base.unionByName(feed)
      .groupBy("id")
      .agg(max_by(struct(feed.columns.filterNot(_ == "id").map(col): _*),
        struct(col("scn"), col("op") =!= "r")).as("st"))
      .select(col("id") +: feed.columns.filterNot(_ == "id").map(f => col(s"st.$f").as(f)): _*)
      .filter(col("op") =!= "d"))
    for (n <- Seq(1, 8, 31)) {
      val got = canon(Ops.chunkedSnapshot(base, feed,
        keyCol = "id", scnCol = "scn", opCol = "op", nChunks = n))
      assert(got == plain, s"nChunks=$n diverged on the fixture")
    }
  }
}
