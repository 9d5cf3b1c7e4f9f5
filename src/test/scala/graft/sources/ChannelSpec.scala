package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.Files

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
