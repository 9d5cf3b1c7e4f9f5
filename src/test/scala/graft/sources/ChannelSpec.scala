package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.Files
import scala.jdk.CollectionConverters._

/** Transport-channel contract: the file channel's replay and subscribe
  * paths deliver byte-identical wire frames that parse to the same typed
  * envelopes (the KafkaChannel implementation shares everything from
  * `envelopes` down — only `subscribe`/`replay` construction differs).
  */
class ChannelSpec extends SparkSpec {

  private val payloadSchema = StructType(Seq(
    StructField("id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  private def writeWire(dir: String): Unit = {
    val s = spark
    import s.implicits._
    val feed = Seq(
      (1L, "click", 1.5, "{}", "c", java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 10L),
      (1L, "view", 2.5, "{}", "u", java.sql.Timestamp.valueOf("2024-01-01 00:01:00"), 20L),
      (2L, "click", 3.5, "{}", "d", java.sql.Timestamp.valueOf("2024-01-01 00:02:00"), 30L)
    ).toDF("id", "event_type", "value", "props", "op", "ts", "scn")
    val lines = graft.cdc.CdcQueries.envelopeOf(feed)
      .select(to_json(struct(col("*"))).as("j")).as[String].collect()
    Files.write(java.nio.file.Paths.get(dir, "w-0.json"),
      String.join("\n", lines: _*).getBytes)
  }

  private def envelopeTriples(df: org.apache.spark.sql.DataFrame) =
    df.select(col("source.scn").as("scn"), col("op"),
        coalesce(col("after.id"), col("before.id")).as("id"))
      .collect().map(r => (r.getAs[Long]("scn"), r.getAs[String]("op"), r.getAs[Long]("id")))
      .toSet

  private val expected = Set((10L, "c", 1L), (20L, "u", 1L), (30L, "d", 2L))

  test("file channel replay parses to the typed envelopes") {
    val dir = Files.createTempDirectory("chan").toString
    writeWire(dir)
    val env = ChangeChannel.envelopes(FileChannel(dir).replay(spark), payloadSchema)
    assert(envelopeTriples(env) == expected)
  }

  test("file channel subscribe streams the same envelopes") {
    val dir = Files.createTempDirectory("chan2").toString
    writeWire(dir)
    val env = ChangeChannel.envelopes(FileChannel(dir).subscribe(spark), payloadSchema)
    val q = env.writeStream.format("memory").queryName("chan_t")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(envelopeTriples(spark.table("chan_t")) == expected)
    } finally q.stop()
  }

  // The spark-sql-kafka connector jar (and a broker) are absent in this
  // environment, so KafkaChannel cannot EXECUTE here. These two tests pin
  // everything short of that: the exact reader option map of the
  // documented contract, and that the channel's construction really
  // reaches Spark's data-source resolution under the name "kafka" (a
  // format-string typo would change the thrown lookup error).
  test("kafka channel option map matches the documented reader contract") {
    val stream = KafkaChannel.readerOptions("b1:9092,b2:9092", "olr.events",
      startingOffsets = "latest", batch = false)
    assert(stream == Map(
      "kafka.bootstrap.servers" -> "b1:9092,b2:9092",
      "subscribe" -> "olr.events",
      "startingOffsets" -> "latest"))
    val batch = KafkaChannel.readerOptions("b1:9092", "olr.events",
      startingOffsets = "earliest", batch = true)
    assert(batch == Map(
      "kafka.bootstrap.servers" -> "b1:9092",
      "subscribe" -> "olr.events",
      "startingOffsets" -> "earliest",
      "endingOffsets" -> "latest"))
    assert(KafkaChannel.Format == "kafka")
  }

  // --- network (OLR-socket-shaped) transport: EXECUTED end to end ---

  private def wireLines(): Seq[String] = {
    val s = spark
    import s.implicits._
    val feed = Seq(
      (1L, "click", 1.5, "{}", "c", java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 10L),
      (1L, "view", 2.5, "{}", "u", java.sql.Timestamp.valueOf("2024-01-01 00:01:00"), 20L),
      (2L, "click", 3.5, "{}", "d", java.sql.Timestamp.valueOf("2024-01-01 00:02:00"), 30L)
    ).toDF("id", "event_type", "value", "props", "op", "ts", "scn")
    graft.cdc.CdcQueries.envelopeOf(feed)
      .select(to_json(struct(col("*"))).as("j")).as[String].collect().toSeq
  }

  test("network channel replay over a live socket parses to the same envelopes as the file channel") {
    val server = new ChangeServer()
    try {
      server.publish(wireLines())
      val spool = Files.createTempDirectory("netspool").toString
      val chan = new NetworkChannel("127.0.0.1", server.boundPort, spool)
      try {
        val env = ChangeChannel.envelopes(chan.replay(spark), payloadSchema)
        assert(envelopeTriples(env) == expected)
        assert(server.acked == 2L, "client must confirm the durable position")
        // a second replay is a no-op fetch (nothing new), same result
        assert(envelopeTriples(
          ChangeChannel.envelopes(chan.replay(spark), payloadSchema)) == expected)
      } finally chan.close()
    } finally server.close()
  }

  test("network channel subscribe pushes live publishes into the stream") {
    val server = new ChangeServer()
    try {
      val lines = wireLines()
      server.publish(lines.take(2))
      val spool = Files.createTempDirectory("netspool2").toString
      val chan = new NetworkChannel("127.0.0.1", server.boundPort, spool)
      try {
        val env = ChangeChannel.envelopes(chan.subscribe(spark), payloadSchema)
        val q = env.writeStream.format("memory").queryName("net_t")
          .outputMode("append").start()
        try {
          def spooled: Long = server.acked + 1
          val deadline = System.nanoTime() + 10_000_000_000L
          while (spooled < 2 && System.nanoTime() < deadline) Thread.sleep(20)
          assert(spooled == 2, "first batch never landed in the spool")
          q.processAllAvailable()
          assert(envelopeTriples(spark.table("net_t")) ==
            Set((10L, "c", 1L), (20L, "u", 1L)))
          // LIVE publish while the stream is running
          server.publish(lines.drop(2))
          while (spooled < 3 && System.nanoTime() < deadline) Thread.sleep(20)
          assert(spooled == 3, "live publish never reached the spool")
          q.processAllAvailable()
          assert(envelopeTriples(spark.table("net_t")) == expected)
        } finally q.stop()
      } finally chan.close()
    } finally server.close()
  }

  test("network channel restart resumes from the durable position without duplicates") {
    val server = new ChangeServer()
    try {
      val lines = wireLines()
      server.publish(lines.take(2))
      val spool = Files.createTempDirectory("netspool3").toString
      val chan1 = new NetworkChannel("127.0.0.1", server.boundPort, spool)
      chan1.drainOnce()
      chan1.close()
      // "restart": a NEW channel over the SAME spool — must request from
      // the persisted position, not refetch (the server would happily
      // resend from 0; the spool would then double every record)
      server.publish(lines.drop(2))
      val chan2 = new NetworkChannel("127.0.0.1", server.boundPort, spool)
      try {
        val env = ChangeChannel.envelopes(chan2.replay(spark), payloadSchema)
        assert(envelopeTriples(env) == expected)
        val s = spark
        import s.implicits._
        val raw = chan2.replay(spark).as[String].collect()
        assert(raw.length == 3, s"restart duplicated or lost wire lines: ${raw.length}")
      } finally chan2.close()
    } finally server.close()
  }

  // the ack travels client→server asynchronously (the server records it
  // on its connection thread), so trim-state assertions wait for it
  private def awaitTrim(server: ChangeServer, to: Long): Unit = {
    val deadline = System.nanoTime() + 10_000_000_000L
    while (server.trimmedTo < to && System.nanoTime() < deadline) Thread.sleep(10)
    assert(server.trimmedTo == to,
      s"trim never reached $to (at ${server.trimmedTo}, acked ${server.acked})")
  }

  test("publish→ack→trim→reconnect: the server log stays bounded and resumes cleanly") {
    val server = new ChangeServer()
    try {
      val lines = (0 until 50).map(i => s"""{"v":$i}""")
      server.publish(lines)
      assert(server.retained == 50 && server.trimmedTo == 0L)
      val spool = Files.createTempDirectory("netspool4").toString
      val chan = new NetworkChannel("127.0.0.1", server.boundPort, spool)
      try {
        chan.drainOnce() // client lands + acks all 50
        awaitTrim(server, 50L)
        assert(server.acked == 49L)
        // ack-trim: everything confirmed durable is GONE from memory
        assert(server.retained == 0, s"log must trim at the ack: ${server.retained}")
        assert(server.size == 50L)
        // the cycle continues: publish → drain → trim again
        server.publish((50 until 80).map(i => s"""{"v":$i}"""))
        assert(server.retained == 30)
        chan.drainOnce()
        awaitTrim(server, 80L)
        assert(server.retained == 0)
        // reconnect AT the trim boundary (the durable position) is fine
        chan.drainOnce() // no-op fetch, no error
        val s = spark
        import s.implicits._
        assert(chan.replay(spark).as[String].collect().length == 80)
      } finally chan.close()
    } finally server.close()
  }

  test("restart below the trim point fails loudly, not silently") {
    val server = new ChangeServer()
    try {
      server.publish((0 until 10).map(i => s"""{"v":$i}"""))
      val spool1 = Files.createTempDirectory("netspool5a").toString
      val c1 = new NetworkChannel("127.0.0.1", server.boundPort, spool1)
      c1.drainOnce() // acks 0..9 → server trims to 10
      c1.close()
      awaitTrim(server, 10L)
      // a FRESH client (empty spool → from 0) asks below the boundary:
      // the server must refuse with the trim position, and the client
      // must surface it as an error — never serve records with a gap
      val spool2 = Files.createTempDirectory("netspool5b").toString
      val c2 = new NetworkChannel("127.0.0.1", server.boundPort, spool2)
      try {
        val e = intercept[IllegalStateException](c2.drainOnce())
        assert(e.getMessage.contains("position_trimmed") &&
          e.getMessage.contains("trimmed to 10"), e.getMessage)
      } finally c2.close()
    } finally server.close()
  }

  test("spool retention deletes fully-confirmed files; replay serves the remainder") {
    val server = new ChangeServer()
    try {
      val spool = Files.createTempDirectory("netspool6").toString
      val chan = new NetworkChannel("127.0.0.1", server.boundPort, spool)
      try {
        // three separate publish+drain rounds → three spool files
        (0 until 3).foreach { r =>
          server.publish((r * 10 until (r + 1) * 10).map(i => s"""{"v":$i}"""))
          chan.drainOnce()
        }
        assert(chan.spoolFiles().map(_._1) == Seq(0L, 10L, 20L))
        // retention below 10 deletes only the first file
        assert(chan.retain(10L) == 1)
        assert(chan.spoolFiles().map(_._1) == Seq(10L, 20L))
        // a mid-file boundary deletes nothing new (file [10,20) ends at 20 > 15)
        assert(chan.retain(15L) == 0)
        // full retention retires every confirmed file; the durable
        // position anchor (_next_pos) is its own file and survives
        assert(chan.retain(1000L) == 2)
        assert(chan.spoolFiles().isEmpty)
        val s = spark
        import s.implicits._
        // the durable position is untouched: a new drain continues at 30
        server.publish(Seq("""{"v":99}"""))
        chan.drainOnce()
        assert(chan.spoolFiles().map(_._1) == Seq(30L))
        assert(chan.replay(spark).as[String].collect().toSeq == Seq("""{"v":99}"""))
      } finally chan.close()
    } finally server.close()
  }

  test("CdcPipeline.startOn over the network channel folds the same state as the file channel") {
    val s = spark
    import s.implicits._
    val feedSchema = StructType(Seq(
      StructField("scn", LongType), StructField("id", LongType),
      StructField("op", StringType), StructField("payload", StringType)))
    val wire = Seq(
      """{"scn":11,"id":1,"op":"u","payload":"one-v2"}""",
      """{"scn":12,"id":3,"op":"c","payload":"three"}""",
      """{"scn":13,"id":2,"op":"d","payload":null}""")
    val base = Seq((0L, 1L, "r", "one"), (0L, 2L, "r", "two"))
      .toDF("scn", "id", "op", "payload")
    val server = new ChangeServer()
    try {
      server.publish(wire)
      val work = Files.createTempDirectory("netpipe")
      val chan = new NetworkChannel("127.0.0.1", server.boundPort,
        work.resolve("spool").toString)
      try {
        val h = graft.cdc.CdcPipeline.startOn(spark, base, keys = Seq("id"),
          snapshotScn = 10L, chan, feedSchema,
          statePath = work.resolve("state").toString,
          checkpointDir = work.resolve("chk").toString)
        try {
          val deadline = System.nanoTime() + 10_000_000_000L
          while (server.acked < 2 && System.nanoTime() < deadline) Thread.sleep(20)
          h.stream.processAllAvailable()
          val got = graft.cdc.Stream
            .readCurrentState(spark, work.resolve("state").toString)
            .select("id", "payload").collect()
            .map(r => r.getLong(0) -> r.getString(1)).toMap
          assert(got == Map(1L -> "one-v2", 3L -> "three"),
            s"network-fed pipeline state diverged: $got")
        } finally h.stream.stop()
      } finally chan.close()
    } finally server.close()
  }

  test("restart storm: live publisher + repeated channel/pipeline restarts fold exactly-once") {
    // The closest executable analog of broker failover in this env
    // (round-15 re-probe: still zero kafka/confluent artifacts in
    // /opt/spark/jars or the offline coursier cache): a producer
    // thread publishes change batches CONTINUOUSLY while the consumer
    // side — NetworkChannel + the full CdcPipeline.startOn stream — is
    // torn down and restarted over and over. Every restart is a new
    // socket subscription from the durable spool position plus a new
    // streaming query resuming the same checkpoint/state; the end
    // state must equal the one-shot fold of the whole event log, and
    // the spool must carry every position exactly once.
    val s = spark
    import s.implicits._
    val feedSchema = StructType(Seq(
      StructField("scn", LongType), StructField("id", LongType),
      StructField("op", StringType), StructField("payload", StringType)))
    val ids = 8
    val batches = 10; val perBatch = 20
    val total = batches * perBatch
    def opOf(n: Long): String =
      if (n % 37 == 0) "d" else if (n % 53 == 0) "c" else "u"
    def lineOf(n: Long): String = {
      val id = n % ids + 1
      val op = opOf(n)
      val payload = if (op == "d") "null" else s""""v$n""""
      s"""{"scn":$n,"id":$id,"op":"$op","payload":$payload}"""
    }
    val base = (1 to 3).map(i => (0L, i.toLong, "r", s"base$i"))
      .toDF("scn", "id", "op", "payload")
    val server = new ChangeServer()
    try {
      val work = Files.createTempDirectory("netstorm")
      val statePath = work.resolve("state").toString
      val publisher = new Thread(() => {
        (0 until batches).foreach { b =>
          server.publish((1 to perBatch).map(k => lineOf((b * perBatch + k).toLong)))
          Thread.sleep(700)
        }
      }, "storm-publisher")
      publisher.start()
      def epoch(): Unit = {
        val chan = new NetworkChannel("127.0.0.1", server.boundPort,
          work.resolve("spool").toString)
        try {
          val h = graft.cdc.CdcPipeline.startOn(spark, base, keys = Seq("id"),
            snapshotScn = 0L, chan, feedSchema,
            statePath = statePath,
            checkpointDir = work.resolve("chk").toString)
          try h.stream.processAllAvailable() finally h.stream.stop()
        } finally chan.close()
      }
      // at least 3 full teardown/restart cycles even if the publisher
      // outpaces them (epoch duration varies with machine load — a
      // timing-dependent count assertion flaked under full-suite load);
      // live-publish overlap happens whenever the publisher is slower
      var rounds = 0
      while (rounds < 3 || ((publisher.isAlive || server.acked < total - 1) && rounds < 60)) {
        epoch(); rounds += 1
      }
      publisher.join()
      assert(server.acked == total - 1,
        s"storm never drained the log: acked ${server.acked} of ${total - 1}")
      epoch() // fold whatever the last teardown cut off

      // exactly-once landing: the spool carries every wire line once
      val spoolLines = {
        val st = Files.list(work.resolve("spool"))
        try st.iterator().asScala
          .filter(_.getFileName.toString.endsWith(".jsonl"))
          .flatMap(p => Files.readAllLines(p).asScala)
          .toSeq
        finally st.close()
      }
      assert(spoolLines.size == total,
        s"spool duplicated or lost wire lines: ${spoolLines.size} of $total")

      // the folded state equals an independent in-JVM replay of the log
      val expect: Map[Long, String] = {
        val m = scala.collection.mutable.Map(
          (1 to 3).map(i => i.toLong -> s"base$i"): _*)
        (1 to total).foreach { n =>
          val id = (n % ids + 1).toLong
          opOf(n.toLong) match {
            case "d" => m.remove(id)
            case _ => m(id.toLong) = s"v$n"
          }
        }
        m.toMap
      }
      val got = graft.cdc.Stream.readCurrentState(spark, statePath)
        .select("id", "payload").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(got == expect, s"storm fold diverged:\n got $got\n want $expect")
    } finally server.close()
  }

  test("crash between data-file and _next_pos commit: orphan is reconciled, never rewritten") {
    val server = new ChangeServer()
    try {
      val lines = (0 until 5).map(i => s"""{"v":$i}""")
      server.publish(lines)
      // simulate the crash window: positions 0-1 landed as a data file
      // but _next_pos was never advanced (still 0)
      val spool = Files.createTempDirectory("netspool-orphan")
      val orphan = spool.resolve("net-000000000000.jsonl")
      Files.write(orphan, (lines.take(2).mkString("\n") + "\n").getBytes("UTF-8"))
      val orphanBytes = Files.readAllBytes(orphan)
      val chan = new NetworkChannel("127.0.0.1", server.boundPort, spool.toString)
      try {
        chan.drainOnce() // server resends from 0 (and MORE than the orphan holds)
        // the orphan must be byte-identical (the file source tracks by
        // name and never re-reads — a rewrite would silently lose rows)
        assert(java.util.Arrays.equals(Files.readAllBytes(orphan), orphanBytes),
          "orphan data file was rewritten")
        // the tail (positions 2-4) lands under ITS position, not 0
        val files = chan.spoolFiles()
        assert(files.map(_._1) == Seq(0L, 2L), s"spool files: ${files.map(_._1)}")
        val s = spark
        import s.implicits._
        val all = chan.replay(spark).as[String].collect().sorted
        assert(all.toSeq == lines.sorted, s"records lost or duplicated: ${all.toSeq}")
      } finally chan.close()
    } finally server.close()
  }

  test("an ack beyond the published end is clamped: no phantom trim, accounting intact") {
    val server = new ChangeServer()
    try {
      server.publish((0 until 3).map(i => s"""{"v":$i}"""))
      // rogue client confirms a position the server never served
      val sock = new java.net.Socket("127.0.0.1", server.boundPort)
      try {
        val w = new java.io.OutputStreamWriter(sock.getOutputStream, java.nio.charset.StandardCharsets.UTF_8)
        w.write("""{"type":"drain","from":3}""" + "\n")
        w.write("""{"type":"ack","pos":999}""" + "\n")
        w.flush()
      } finally sock.close()
      val deadline = System.nanoTime() + 5_000_000_000L
      while (server.acked < 2L && System.nanoTime() < deadline) Thread.sleep(10)
      assert(server.acked == 2L, s"ack must clamp to the published end, got ${server.acked}")
      assert(server.trimmedTo == 3L && server.size == 3L,
        s"phantom trim: trimmedTo=${server.trimmedTo}, size=${server.size}")
      // positions continue contiguously — a later publish+drain works
      server.publish(Seq("""{"v":3}"""))
      val spool = Files.createTempDirectory("netspool-clamp").toString
      val chan = new NetworkChannel("127.0.0.1", server.boundPort, spool)
      try {
        // start from the retention boundary (0-2 were trimmed by the rogue ack)
        Files.write(java.nio.file.Paths.get(spool, "_next_pos"), "3".getBytes("UTF-8"))
        chan.drainOnce()
        val s = spark
        import s.implicits._
        assert(chan.replay(spark).as[String].collect().toSeq == Seq("""{"v":3}"""))
      } finally chan.close()
    } finally server.close()
  }

  test("kafka channel reaches data-source resolution under format 'kafka'") {
    val chan = KafkaChannel("localhost:9092", "olr.events")
    val streamErr = intercept[Exception](chan.subscribe(spark))
    assert(streamErr.getMessage.toLowerCase.contains("kafka"),
      s"subscribe failed before format lookup: ${streamErr.getMessage}")
    val batchErr = intercept[Exception](chan.replay(spark))
    assert(batchErr.getMessage.toLowerCase.contains("kafka"),
      s"replay failed before format lookup: ${batchErr.getMessage}")
  }
}
