package graft.cdc

import org.apache.spark.sql.types._

/** The change-event envelope — the engine's central datatype.
  *
  * Shape follows the Debezium envelope the reference pipeline produces
  * (reference `README.md:803` source connector; unwrap SMT
  * `README.md:844-848`) with the source fields OpenLogReplicator is
  * configured to emit (`scripts/OpenLogReplicator.json:21-26`:
  * scn/xid/rid/timestamps):
  *
  * {{{
  * value: STRUCT<
  *   before STRUCT<row>,   -- null for op IN ('c','r')
  *   after  STRUCT<row>,   -- null for op = 'd'
  *   op     STRING,        -- c|u|d|r   (r = snapshot read)
  *   ts_ms  LONG,
  *   source STRUCT<scn LONG, xid STRING, rid STRING,
  *                 db STRING, schema STRING, table STRING>>
  * }}}
  *
  * The row schema is a parameter: the engine is generic over tables
  * (north star), while the reference had exactly one
  * (`OLR_DB.PRODUCT`, `scripts-db/set-up-orl.sql:194-202`).
  */
object Envelope {

  val sourceSchema: StructType = StructType(Seq(
    StructField("scn", LongType),
    StructField("xid", StringType),
    StructField("rid", StringType),
    StructField("db", StringType),
    StructField("schema", StringType),
    StructField("table", StringType)
  ))

  /** Full envelope schema for a given row payload schema. */
  def schema(row: StructType): StructType = StructType(Seq(
    StructField("before", row),
    StructField("after", row),
    StructField("op", StringType),
    StructField("ts_ms", LongType),
    StructField("source", sourceSchema)
  ))

  /** Row schema of the reference's `PRODUCT` table
    * (`scripts-db/set-up-orl.sql:194-202`; Spark-internal types per
    * SURVEY.md §1.2 — compute on native types, cast at the wire
    * boundary only).
    */
  val productRow: StructType = StructType(Seq(
    StructField("ID", LongType, nullable = false),
    StructField("NAME", StringType, nullable = false),
    StructField("DESCRIPTION", StringType),
    StructField("PRICE", DecimalType(10, 2), nullable = false),
    StructField("STOCK", LongType),
    StructField("CREATED_DATE", TimestampType),
    StructField("UPDATED_DATE", TimestampType)
  ))

  val productEnvelope: StructType = schema(productRow)
}
