package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Transport channel abstraction (SURVEY.md §2.1 "Kafka transport"):
  * the reference moves change events producer→sinks over a 3-broker
  * Kafka cluster (`docker-compose-main.yml:19-95`); this environment has
  * no broker, so the engine runs on the file channel. The trait makes
  * the swap a CONSTRUCTOR ARGUMENT rather than a code edit: every
  * streaming entry point takes a [[ChangeChannel]], and both
  * implementations produce the same `value: STRING` wire frame.
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
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("subscribe", topic)
      .option("startingOffsets", startingOffsets)
      .load()
      .select(col("value").cast("string").as("value"))

  override def replay(spark: SparkSession): DataFrame =
    spark.read
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("subscribe", topic)
      .option("startingOffsets", "earliest")
      .option("endingOffsets", "latest")
      .load()
      .select(col("value").cast("string").as("value"))
}

object ChangeChannel {

  /** Parse a channel's raw wire stream into typed envelopes (shared by
    * both transports — the step after `subscribe`/`replay`).
    */
  def envelopes(raw: DataFrame, rowSchema: StructType): DataFrame =
    graft.cdc.Ops.envelopeParse(raw, "value", rowSchema)
}
