package graft.cdc

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Streaming side of the CDC engine (SURVEY.md §2.10) — Structured
  * Streaming equivalents of the reference's OLR→Debezium→Kafka→sink path
  * (§3.1/§3.3). The transport is a file channel (directory of JSON change
  * events) standing in for Kafka: same envelope, same semantics; swapping
  * `format("json")` for `format("kafka")` is a one-line change where a
  * broker exists.
  *
  * Scale notes:
  *  - The upsert state lives in the SINK (parquet snapshot rewritten per
  *    micro-batch via `foreachBatch`), mirroring the reference's
  *    JDBC-upsert design (`insert.mode=upsert`, README.md:840) rather
  *    than `flatMapGroupsWithState` — per-key streaming state for a
  *    100 TB table would be unbounded (SURVEY.md §7.5). On a cluster the
  *    rewrite becomes a MERGE into a transactional table format; the
  *    per-batch dataflow (applyChanges(old ∪ delta)) is identical.
  *  - `maxFilesPerTrigger` bounds per-batch memory like OLR's
  *    `memory.max-mb` (`scripts/OpenLogReplicator.json:28-31`).
  */
object Stream {

  /** Tail a directory of JSON change events (schema = envelope of
    * `rowSchema`) as a stream — the engine's redo-log scan equivalent.
    */
  def readEnvelopeStream(
      spark: SparkSession,
      dir: String,
      rowSchema: StructType,
      maxFilesPerTrigger: Int = 10
  ): DataFrame =
    spark.readStream
      .schema(Envelope.schema(rowSchema))
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .json(dir)

  /** Continuously materialize a change-event stream into a current-state
    * parquet table at `statePath`, exactly-once via `checkpointDir`
    * (reference's checkpoint/resume, the `olr-checkpoint` JSON files).
    *
    * Each micro-batch folds `applyChanges(previousState ∪ batch)`:
    * idempotent under redelivery (at-least-once file source + last-write-
    * wins by scn), so restart-from-checkpoint is exactly-once end to end.
    */
  def materialize(
      feed: DataFrame,
      keys: Seq[String],
      ordering: Seq[String],
      statePath: String,
      checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()
  ): StreamingQuery = {
    val cols = feed.columns.toSeq
    feed.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val prev =
          try Some(spark.read.parquet(statePath).select(cols.map(col): _*))
          catch { case _: Throwable => None }
        // previous state rows are already latest-per-key; union keeps
        // their (scn, op) so ordering vs the new delta stays correct.
        val all = prev.fold(batch.select(cols.map(col): _*))(p =>
          p.unionByName(batch.select(cols.map(col): _*)))
        val next = Ops.applyChanges(all, keys, ordering)
        // write-then-swap: parquet has no transactional MERGE; write to a
        // temp dir and atomically rename so readers never see a torn state.
        val tmp = statePath + "__tmp"
        next.select(cols.map(col): _*).write.mode("overwrite").parquet(tmp)
        val fs = org.apache.hadoop.fs.FileSystem.get(
          spark.sparkContext.hadoopConfiguration)
        val dst = new org.apache.hadoop.fs.Path(statePath)
        fs.delete(dst, true)
        fs.rename(new org.apache.hadoop.fs.Path(tmp), dst)
        ()
      }
      .start()
  }

  /** Streaming dedup under at-least-once delivery (reference: Connect
    * restarts redeliver; SURVEY §2.10): watermark bounds the dedup state.
    */
  def dedupStream(feed: DataFrame, eventTime: String, watermark: String, keys: Seq[String]): DataFrame =
    feed.withWatermark(eventTime, watermark).dropDuplicates(keys)

  /** Tumbling/sliding window aggregation over an event-time stream. */
  def tumblingCounts(feed: DataFrame, eventTime: String, watermark: String, width: String): DataFrame =
    feed
      .withWatermark(eventTime, watermark)
      .groupBy(window(col(eventTime), width))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("bucket"), col("n"))

  /** Session windows (north-star §2.10): gap-based sessionization. */
  def sessionCounts(feed: DataFrame, eventTime: String, watermark: String, gap: String, key: String): DataFrame =
    feed
      .withWatermark(eventTime, watermark)
      .groupBy(col(key), session_window(col(eventTime), gap))
      .agg(count(lit(1)).as("n"))
      .select(col(key), col("session_window.start").as("sess_start"),
        col("session_window.end").as("sess_end"), col("n"))
}
