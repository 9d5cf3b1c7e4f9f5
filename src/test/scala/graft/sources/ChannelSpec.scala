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
}
