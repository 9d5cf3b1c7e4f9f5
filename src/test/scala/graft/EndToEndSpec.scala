package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.Files

/** The reference's COMPLETE path in one flow (SURVEY §3.1 + §3.3):
  * change events as Debezium envelopes on the wire → channel subscribe →
  * envelope parse → unwrap (delete rewrite) → streaming JDBC upsert into
  * a real database (embedded Derby) — every stage the individual specs
  * prove, stitched end to end, checked against the engine's own batch
  * fold of the same history.
  */
class EndToEndSpec extends SparkSpec {

  System.setProperty("derby.system.home", Files.createTempDirectory("derby-e2e").toString)

  private val payloadSchema = StructType(Seq(
    StructField("id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  test("wire envelopes → parse → unwrap → upsertStream → Derby equals the batch fold") {
    val s = spark
    import s.implicits._
    val url = s"jdbc:derby:memory:e2e${java.util.UUID.randomUUID().toString.take(8)};create=true"
    val (wireDir, chk) = (Files.createTempDirectory("e2e-wire"), Files.createTempDirectory("e2e-chk"))

    // a 150-event history over 23 keys with creates/updates/deletes
    val feed = (0 until 150).map { i =>
      val op = if (i % 11 == 5) "d" else if (i < 23) "c" else "u"
      (i.toLong, (i % 23).toLong, op,
        s"t$i", (i * 37 % 991) / 10.0, "{}",
        java.sql.Timestamp.valueOf("2024-01-01 00:00:00"))
    }.toDF("scn", "id", "op", "event_type", "value", "props", "ts")
      .select(col("id"), col("event_type"), col("value"), col("props"),
        col("op"), col("ts"), col("scn"))

    // producer side: full Debezium envelopes as JSON lines on the wire,
    // in scn order across files (the Kafka per-key ordering contract)
    val lines = cdc.CdcQueries.envelopeOf(feed)
      .orderBy("source.scn")
      .select(to_json(struct(col("*"))).as("j")).as[String].collect()
    lines.grouped(50).zipWithIndex.foreach { case (g, i) =>
      val p = wireDir.resolve(s"w-$i.json")
      Files.write(p, String.join("\n", g.toSeq: _*).getBytes)
      Files.setLastModifiedTime(p,
        java.nio.file.attribute.FileTime.fromMillis(1700000000000L + i * 1000L))
    }

    // consumer side: channel → envelopes → unwrap → latest-per-key upsert
    val env = sources.ChangeChannel.envelopes(
      sources.FileChannel(wireDir.toString, maxFilesPerTrigger = 1).subscribe(s),
      payloadSchema)
    val unwrapped = cdc.Ops.unwrap(env)
      .select("id", "event_type", "value", "scn", "op") // drop __deleted: op drives deletes
    val q = sinks.JdbcUpsert.upsertStream(
      unwrapped, url, "e2e_state", keys = Seq("id"), ordering = Seq("scn"),
      checkpointDir = chk.toString)
    q.awaitTermination()

    val got = s.read.format("jdbc").option("url", url).option("dbtable", "e2e_state").load()
      .collect()
      .map(r => (r.getAs[Long]("ID"), r.getAs[Long]("SCN"),
        r.getAs[String]("EVENT_TYPE"), r.getAs[Double]("VALUE")))
      .toSet
    val want = cdc.Ops.applyChanges(
      feed.select("id", "event_type", "value", "scn", "op"),
      keys = Seq("id"), ordering = Seq("scn"))
      .collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[Long]("scn"),
        r.getAs[String]("event_type"), r.getAs[Double]("value")))
      .toSet
    assert(got == want)
    assert(got.nonEmpty, "vacuous end-to-end run")
  }
}
