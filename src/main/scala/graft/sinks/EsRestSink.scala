package graft.sinks

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Executable Elasticsearch delivery over the plain REST `_bulk` API —
  * what the connector jar does under the hood, re-expressed with JDK
  * HTTP so it RUNS in this environment (and anywhere else) with zero
  * extra dependencies. [[EsSink]] remains the option-map contract for a
  * deployment that ships elasticsearch-spark; this sink is the engine's
  * own executable path, exercised end-to-end in EsSinkSpec against an
  * embedded HTTP server speaking the bulk protocol.
  *
  * Semantics mirror the reference's Connect sink config
  * (`/root/reference/Dockerfile:62-63`: document id from the record
  * key, null/tombstoned value → document delete):
  *  - live rows → `{"index":{"_id":k}}` + the row as a JSON doc (a
  *    full-document upsert — the idempotent form under redelivery);
  *  - rows flagged `__deleted` → `{"delete":{"_id":k}}`.
  *
  * Scale shape: the document JSON is rendered IN THE PLAN by `to_json`
  * (codegen, executor-side); `foreachPartition` then streams ndjson
  * chunks of `maxDocsPerBulk` straight from each partition to the
  * service — no driver funnel, no shuffle, HTTP parallelism = partition
  * parallelism, exactly the connector's layout. A failed bulk (HTTP
  * error or `"errors":true` in the response) throws, failing the task
  * so Spark's retry re-sends the chunk — safe because both actions are
  * idempotent.
  */
object EsRestSink {

  /** Index `df` into `{baseUrl}/{index}`: upsert by `idColumn`, delete
    * where `deletedCol` == "true" (column optional — absent means all
    * rows are live). Returns (upserts, deletes) action counts.
    */
  def write(df: DataFrame, baseUrl: String, index: String, idColumn: String,
      deletedCol: String = "__deleted", maxDocsPerBulk: Int = 500): (Long, Long) = {
    val hasDeleted = df.columns.contains(deletedCol)
    val deletedFlag =
      if (hasDeleted) col(deletedCol) === "true" else lit(false)
    val docCols = df.columns.filterNot(_ == deletedCol).map(col)
    val rows = df.select(
      col(idColumn).cast("string").as("_k"),
      // null-safe: a null deleted flag (nullable deletedCol) means
      // "not a delete" — r.getBoolean on the raw comparison would NPE
      coalesce(deletedFlag, lit(false)).as("_del"),
      to_json(struct(docCols.toIndexedSeq: _*)).as("_doc"))
    val counts = rows.sparkSession.sparkContext
      .longAccumulator("es-rest-sink-upserts") ->
      rows.sparkSession.sparkContext.longAccumulator("es-rest-sink-deletes")
    val (upserts, deletes) = counts
    rows.foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
      // explicit timeouts (the RegistryHttp rule): the JDK default is
      // NONE, so a half-open ES node would block send() forever and
      // wedge the task instead of failing into Spark's retry
      val http = java.net.http.HttpClient.newBuilder()
        .connectTimeout(java.time.Duration.ofSeconds(10))
        .build()
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      it.grouped(maxDocsPerBulk).foreach { chunk =>
        val body = new StringBuilder
        chunk.foreach { r =>
          // clear diagnosis instead of a bare NPE after full task
          // retries: an external CDC frame with a null key is a data
          // bug the operator must name
          if (r.isNullAt(0)) throw new IllegalArgumentException(
            s"EsRestSink: null '$idColumn' — a document id is required; " +
              "filter or key-fill the frame before the sink")
          val k = jsonEscape(r.getString(0))
          if (r.getBoolean(1)) {
            body.append(s"""{"delete":{"_index":"$index","_id":"$k"}}""").append('\n')
            deletes.add(1)
          } else {
            body.append(s"""{"index":{"_index":"$index","_id":"$k"}}""").append('\n')
            body.append(r.getString(2)).append('\n')
            upserts.add(1)
          }
        }
        val req = java.net.http.HttpRequest.newBuilder(
            java.net.URI.create(s"$baseUrl/_bulk"))
          .header("Content-Type", "application/x-ndjson")
          .timeout(java.time.Duration.ofSeconds(60))
          .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body.toString))
          .build()
        val resp = http.send(req,
          java.net.http.HttpResponse.BodyHandlers.ofString())
        require(resp.statusCode() / 100 == 2,
          s"_bulk failed: HTTP ${resp.statusCode()} ${resp.body().take(500)}")
        // the bulk API reports per-item failures inside a 200 — surface
        // them as a task failure so Spark retries the chunk
        val errors = mapper.readTree(resp.body()).path("errors").asBoolean(false)
        require(!errors, s"_bulk reported item errors: ${resp.body().take(500)}")
      }
    }
    (upserts.value, deletes.value)
  }

  private def jsonEscape(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
}
