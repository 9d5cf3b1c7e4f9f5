package graft.sinks

import graft.SparkSpec

/** The elasticsearch-spark connector jar (and an ES service) are absent
  * in this environment, so EsSink cannot EXECUTE here; these tests pin
  * everything short of that — the exact writer/delete option maps of the
  * documented contract, and that the write path really reaches Spark's
  * data-source resolution under the name "es" (same treatment as
  * KafkaChannel in ChannelSpec).
  */
class EsSinkSpec extends SparkSpec {

  test("es sink option maps match the documented writer contract") {
    val up = EsSink.writerOptions("es1:9200,es2:9200", "events/_doc", "id")
    assert(up == Map(
      "es.nodes" -> "es1:9200,es2:9200",
      "es.resource" -> "events/_doc",
      "es.mapping.id" -> "id",
      "es.write.operation" -> "upsert"))
    val del = EsSink.deleteOptions("es1:9200,es2:9200", "events/_doc", "id")
    assert(del("es.write.operation") == "delete")
    assert(del - "es.write.operation" == up - "es.write.operation")
    assert(EsSink.Format == "es")
  }

  test("es sink reaches data-source resolution under format 'es'") {
    val s = spark
    import s.implicits._
    val unwrapped = Seq(
      (1L, "x", "false", 10L, "c"),
      (2L, "y", "true", 20L, "d")
    ).toDF("id", "payload", "__deleted", "scn", "op")
    val err = intercept[Exception] {
      EsSink.write(unwrapped, "localhost:9200", "events/_doc", "id")
    }
    val msg = err.getMessage.toLowerCase
    assert(msg.contains("es") && (msg.contains("data source") || msg.contains("datasource")),
      s"write failed before format lookup: ${err.getMessage}")
  }

  /** Minimal in-JVM ES double: speaks the `_bulk` ndjson protocol,
    * applies index/delete actions to a concurrent map (executor
    * partitions POST in parallel), and can be switched to report
    * per-item errors for the failure path.
    */
  private final class FakeEs {
    val docs = new java.util.concurrent.ConcurrentHashMap[String, String]()
    val bulks = new java.util.concurrent.atomic.AtomicInteger(0)
    @volatile var failItems = false
    private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    private val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/_bulk", (ex: com.sun.net.httpserver.HttpExchange) => {
      bulks.incrementAndGet()
      val lines = new String(ex.getRequestBody.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8).split('\n').filter(_.nonEmpty)
      var i = 0
      while (i < lines.length) {
        val action = mapper.readTree(lines(i))
        if (action.has("index")) {
          docs.put(action.get("index").get("_id").asText(), lines(i + 1))
          i += 2
        } else if (action.has("delete")) {
          docs.remove(action.get("delete").get("_id").asText())
          i += 1
        } else sys.error(s"unknown bulk action: ${lines(i)}")
      }
      val resp = s"""{"took":1,"errors":$failItems,"items":[]}"""
      val bytes = resp.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      ex.getResponseHeaders.set("Content-Type", "application/json")
      ex.sendResponseHeaders(200, bytes.length)
      val os = ex.getResponseBody
      try os.write(bytes) finally os.close()
    })
    server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(8))
    server.start()
    def baseUrl = s"http://127.0.0.1:${server.getAddress.getPort}"
    def stop(): Unit = server.stop(0)
  }

  test("REST bulk sink EXECUTES: upserts + deletes land over live HTTP, redelivery idempotent") {
    val s = spark
    import s.implicits._
    val es = new FakeEs
    try {
      val unwrapped = Seq(
        (1L, "x", "false", 10L),
        (2L, "y", "true", 20L),
        (3L, "z", "false", 30L)
      ).toDF("id", "payload", "__deleted", "scn")
      val (up, del) = EsRestSink.write(unwrapped, es.baseUrl, "events", "id")
      assert((up, del) == (2L, 1L))
      assert(es.docs.keySet().size == 2 && es.docs.containsKey("1") && es.docs.containsKey("3"))
      // the indexed doc is the row itself as JSON (to_json of the plan),
      // without the deleted flag
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      val doc1 = mapper.readTree(es.docs.get("1"))
      assert(doc1.get("payload").asText() == "x" && doc1.get("scn").asLong() == 10L)
      assert(!doc1.has("__deleted"))
      // redelivery of the same batch is idempotent — same final state
      EsRestSink.write(unwrapped, es.baseUrl, "events", "id")
      assert(es.docs.keySet().size == 2)
      // a doc for a previously-live key arriving deleted removes it
      val tomb = Seq((1L, "x", "true", 40L)).toDF("id", "payload", "__deleted", "scn")
      EsRestSink.write(tomb, es.baseUrl, "events", "id")
      assert(es.docs.keySet().size == 1 && es.docs.containsKey("3"))
      // chunking: maxDocsPerBulk=1 splits a partition into one bulk per doc
      val before = es.bulks.get()
      EsRestSink.write(unwrapped.repartition(1), es.baseUrl, "events", "id",
        maxDocsPerBulk = 1)
      assert(es.bulks.get() - before == 3, "expected one _bulk POST per action")
    } finally es.stop()
  }

  test("REST bulk sink fails the job when the service reports item errors") {
    val s = spark
    import s.implicits._
    val es = new FakeEs
    try {
      es.failItems = true
      val df = Seq((1L, "x", "false", 10L)).toDF("id", "payload", "__deleted", "scn")
      val err = intercept[Exception] {
        EsRestSink.write(df, es.baseUrl, "events", "id")
      }
      def causes(t: Throwable): Seq[Throwable] =
        if (t == null) Nil else t +: causes(t.getCause)
      assert(causes(err).exists(c =>
        String.valueOf(c.getMessage).contains("_bulk reported item errors")),
        s"unexpected failure: $err")
    } finally es.stop()
  }
}
