package graft.sinks

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{coalesce, col, lit, lower}

/** Elasticsearch sink shim — the reference's secondary delivery path
  * (its Connect image installs the Elasticsearch sink connector,
  * `/root/reference/Dockerfile:62-63`, configured like the JDBC sink:
  * document id from the record key, null value → document delete).
  *
  * The Spark-side equivalent is the elasticsearch-hadoop connector's
  * DataSource, registered under the short name `"es"`, driven entirely by
  * an option map (`es.nodes`/`es.resource`/`es.mapping.id`/
  * `es.write.operation`). Neither the connector jar nor an ES service
  * exists in this environment, so — same treatment as
  * [[graft.sources.KafkaChannel]] — the sink COMPILES against the stable
  * string contract, the option map is a pure function pinned exactly by
  * EsSinkSpec, and the spec proves the writer reaches Spark's
  * data-source resolution under the name "es". Executing it is a
  * deployment concern: add the elasticsearch-spark jar and the same code
  * runs unchanged.
  *
  * Scale shape: the connector bulk-indexes per partition from the
  * executors (no driver funnel), so the same latest-per-key + partition
  * parallelism reasoning as [[JdbcUpsert]] applies.
  */
object EsSink {

  /** Data-source short name the elasticsearch-hadoop connector registers
    * (`org.elasticsearch.spark.sql` is the long form).
    */
  val Format = "es"

  /** Writer option map for an upsert-style index: `idColumn` becomes the
    * document `_id` (Connect's `key.ignore=false` + id from record key),
    * `es.write.operation=upsert` makes re-delivery idempotent.
    */
  def writerOptions(nodes: String, index: String, idColumn: String): Map[String, String] =
    Map(
      "es.nodes" -> nodes,
      "es.resource" -> index,
      "es.mapping.id" -> idColumn,
      "es.write.operation" -> "upsert")

  /** Delete-stream options: ids-only writes with `operation=delete` —
    * the Connect sink's `behavior.on.null.values=delete` analog for
    * tombstoned keys.
    */
  def deleteOptions(nodes: String, index: String, idColumn: String): Map[String, String] =
    writerOptions(nodes, index, idColumn) + ("es.write.operation" -> "delete")

  /** Index the unwrap output (see [[graft.cdc.Ops.unwrap]]): live rows
    * are upserted by `idColumn`; rows flagged deleted (`deletedCol`,
    * the unwrap rewrite's `__deleted`) are issued as document deletes.
    * Callers should reduce to latest-per-key first, like the JDBC sink.
    */
  def write(df: DataFrame, nodes: String, index: String, idColumn: String,
      deletedCol: String = "__deleted"): Unit = {
    val hasDeleted = df.columns.contains(deletedCol)
    if (!hasDeleted) {
      df.write.format(Format)
        .options(writerOptions(nodes, index, idColumn))
        .mode("append").save()
    } else {
      // cache across the two passes: the upsert and delete writes would
      // otherwise each recompute the full upstream lineage (channel →
      // parse → unwrap → latest-per-key), and a changing source between
      // the two jobs would even split one batch into inconsistent halves
      val cached = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        // canonical delete predicate (EsRestSink's rule): anything that
        // is not exactly true-ish is a LIVE row. The old pair of string
        // equality filters matched neither side for a null flag, a
        // boolean-typed column, or "TRUE" — silently dropping live
        // documents from both passes.
        val isDel = coalesce(
          lower(col(deletedCol).cast("string")) === "true", lit(false))
        cached.filter(!isDel).drop(deletedCol)
          .write.format(Format)
          .options(writerOptions(nodes, index, idColumn))
          .mode("append").save()
        cached.filter(isDel).select(idColumn)
          .write.format(Format)
          .options(deleteOptions(nodes, index, idColumn))
          .mode("append").save()
      } finally cached.unpersist()
    }
  }
}
