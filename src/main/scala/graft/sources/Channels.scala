package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Transport channel abstraction (SURVEY.md §2.1 "Kafka transport"):
  * the reference moves change events producer→sinks over a 3-broker
  * Kafka cluster (`docker-compose-main.yml:19-95`); this environment has
  * no broker, so the engine runs on the file channel. The trait makes
  * the swap a CONSTRUCTOR ARGUMENT rather than a code edit: every
  * streaming entry point takes a [[ChangeChannel]], and all
  * implementations ([[FileChannel]], [[KafkaChannel]], the executed
  * TCP [[NetworkChannel]]) produce the same `value: STRING` wire frame.
  */
trait ChangeChannel {

  /** Subscribe to the raw wire stream: one STRING column `value` per
    * change message (the JSON envelope; Avro framing composes via
    * [[AvroCodec]]/[[SchemaFrame]] upstream of the JSON step).
    */
  def subscribe(spark: SparkSession): DataFrame

  /** Batch replay of everything currently in the channel (backfill). */
  def replay(spark: SparkSession): DataFrame
}

/** Directory of JSON-lines files — the broker stand-in used by all specs
  * and fixtures. At-least-once, ordered per file by mtime.
  */
final case class FileChannel(dir: String, maxFilesPerTrigger: Int = 10) extends ChangeChannel {

  override def subscribe(spark: SparkSession): DataFrame =
    spark.readStream
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .text(dir)

  override def replay(spark: SparkSession): DataFrame =
    spark.read.text(dir)
}

/** Kafka topic channel — the production transport. Compiles against the
  * stable `format("kafka")` string contract; running it requires the
  * spark-sql-kafka connector jar and a broker, neither present in this
  * environment (UNTESTED here for that reason — the swap point the
  * reference's `docker-compose-main.yml` deployment would exercise).
  * Per-key ordering (the upsert sink's assumption, see
  * `sinks/JdbcUpsert`) comes from Kafka's key→partition contract.
  */
final case class KafkaChannel(
    bootstrapServers: String,
    topic: String,
    startingOffsets: String = "earliest") extends ChangeChannel {

  override def subscribe(spark: SparkSession): DataFrame =
    spark.readStream
      .format(KafkaChannel.Format)
      .options(KafkaChannel.readerOptions(bootstrapServers, topic, startingOffsets, batch = false))
      .load()
      .select(col("value").cast("string").as("value"))

  override def replay(spark: SparkSession): DataFrame =
    spark.read
      .format(KafkaChannel.Format)
      .options(KafkaChannel.readerOptions(bootstrapServers, topic, startingOffsets = "earliest", batch = true))
      .load()
      .select(col("value").cast("string").as("value"))
}

object KafkaChannel {

  /** The stable data-source name the spark-sql-kafka connector registers
    * under — a string contract, so a typo would only surface at runtime;
    * `ChannelSpec` pins it (and proves it reaches Spark's data-source
    * resolution) without needing the connector on the classpath.
    */
  val Format = "kafka"

  /** The full reader option map, as a pure function so tests can assert
    * the exact wire contract: `kafka.bootstrap.servers` + `subscribe` +
    * `startingOffsets` for streams; batch replay additionally bounds the
    * read with `endingOffsets=latest` (streaming reads reject that key).
    */
  def readerOptions(bootstrapServers: String, topic: String,
      startingOffsets: String, batch: Boolean): Map[String, String] = {
    val base = Map(
      "kafka.bootstrap.servers" -> bootstrapServers,
      "subscribe" -> topic,
      "startingOffsets" -> startingOffsets)
    if (batch) base + ("endingOffsets" -> "latest") else base
  }
}

object ChangeChannel {

  /** Parse a channel's raw wire stream into typed envelopes (shared by
    * both transports — the step after `subscribe`/`replay`).
    */
  def envelopes(raw: DataFrame, rowSchema: StructType): DataFrame =
    graft.cdc.Ops.envelopeParse(raw, "value", rowSchema)
}
