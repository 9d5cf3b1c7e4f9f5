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
}
