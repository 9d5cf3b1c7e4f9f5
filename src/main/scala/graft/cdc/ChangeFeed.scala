package graft.cdc

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Engine

/** Canonical change feed derived from the driver fixture `events` table
  * (FIXTURES.md §B: "`events` doubles as the CDC/streaming fixture base,
  * ordered by `event_id` as a stand-in SCN").
  *
  * Mapping (deterministic, mirrored 1:1 by the DuckDB oracle CTE below):
  *   scn = event_id          (monotone version — SURVEY.md §1.2 SCN row)
  *   id  = user_id           (the key, like the reference PK `ID`)
  *   op  = signup→'c', error→'d', otherwise 'u'
  *   payload = ts, event_type, value, props
  */
object ChangeFeed {

  def fromEvents(spark: SparkSession, dir: String): DataFrame =
    fromEventsDf(Engine.table(spark, dir, "events"))

  def fromEventsDf(events: DataFrame): DataFrame =
    events.select(
      col("event_id").as("scn"),
      col("user_id").as("id"),
      when(col("event_type") === "signup", "c")
        .when(col("event_type") === "error", "d")
        .otherwise("u")
        .as("op"),
      col("ts"),
      col("event_type"),
      col("value"),
      col("props")
    )

  /** DuckDB mirror of [[fromEvents]]; prepend to oracle SQL. */
  val sqlCte: String =
    """WITH feed AS (
      |  SELECT event_id AS scn, user_id AS id,
      |         CASE event_type WHEN 'signup' THEN 'c' WHEN 'error' THEN 'd' ELSE 'u' END AS op,
      |         ts, event_type, value, props
      |  FROM events
      |)""".stripMargin
}
