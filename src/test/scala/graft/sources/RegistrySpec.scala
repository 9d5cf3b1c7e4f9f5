package graft.sources

import graft.SparkSpec
import java.nio.file.Files

/** Schema registry / history-log / Confluent-frame contract:
  * frame layout is byte-exact, registration is idempotent and versioned,
  * the on-disk log replays to identical state, and a mixed-version
  * framed stream decodes through per-record writer-schema resolution.
  */
class RegistrySpec extends SparkSpec {

  private val v1 = AvroCodec.nationSchemaJson
  // evolution: added field with default — backward-compatible
  private val v2 =
    """{"type":"record","name":"nation","fields":[
      |{"name":"n_nationkey","type":"int"},
      |{"name":"n_name","type":"string"},
      |{"name":"n_regionkey","type":"int"},
      |{"name":"n_comment","type":"string","default":""}]}""".stripMargin

  test("confluent frame layout: magic 0x00 + 4-byte big-endian id + payload") {
    val payload = Array[Byte](7, 8, 9)
    val framed = SchemaFrame.frame(0x01020304, payload)
    assert(framed.length == 8)
    assert(framed(0) == 0x00)
    assert(framed.slice(1, 5).toSeq == Seq[Byte](0x01, 0x02, 0x03, 0x04)) // big-endian
    assert(framed.slice(5, 8).toSeq == payload.toSeq)
    val (id, body) = SchemaFrame.unframe(framed)
    assert(id == 0x01020304 && body.toSeq == payload.toSeq)
    intercept[IllegalArgumentException](SchemaFrame.unframe(Array[Byte](1, 0, 0, 0, 5)))
    intercept[IllegalArgumentException](SchemaFrame.unframe(Array[Byte](0, 0)))
  }

  test("registration is idempotent, versions increment, history log replays") {
    val dir = Files.createTempDirectory("reg").toString
    val reg = SchemaRegistry.open(dir)
    val id1 = reg.register("nation-value", v1)
    val id2 = reg.register("nation-value", v2)
    val idOther = reg.register("orders-value", """{"type":"record","name":"o","fields":[]}""")
    assert(reg.register("nation-value", v1) == id1, "re-registration must return the same id")
    assert(id1 != id2 && id2 != idOther)
    assert(reg.history("nation-value").map(e => (e._1, e._2)) == Seq((id1, 1), (id2, 2)))
    assert(reg.latest("nation-value").map(_._1).contains(id2))
    // replay: a fresh instance over the same directory folds the
    // append-only log back to identical state (the DDL-history analog)
    val replayed = SchemaRegistry.open(dir)
    assert(replayed.schemasById == reg.schemasById)
    assert(replayed.history("nation-value") == reg.history("nation-value"))
    assert(replayed.register("nation-value", v2) == id2)
  }

  test("compatibility gate: Avro resolution rules decide what registers") {
    val dir = Files.createTempDirectory("reg-compat").toString
    val reg = SchemaRegistry.open(dir)
    val id1 = reg.registerChecked("nation-value", v1)
    // adding a field WITH a default: new readers resolve old data → BACKWARD ok
    val id2 = reg.registerChecked("nation-value", v2)
    assert(id2 > id1)
    // re-registering an existing version skips the check and is idempotent
    assert(reg.registerChecked("nation-value", v1) == id1)
    // adding a NEW field WITHOUT a default (absent from the latest
    // version, so the new reader cannot fill it from old data) →
    // BACKWARD-incompatible, rejected, nothing written. (n_comment
    // without a default would be ADMITTED here — latest v2 carries the
    // field in its data — which is exactly the checks-against-latest
    // semantics of the real registry.)
    val v3bad =
      """{"type":"record","name":"nation","fields":[
        |{"name":"n_nationkey","type":"int"},
        |{"name":"n_name","type":"string"},
        |{"name":"n_regionkey","type":"int"},
        |{"name":"n_comment","type":"string","default":""},
        |{"name":"n_extra","type":"string"}]}""".stripMargin
    val before = reg.history("nation-value").size
    val e = intercept[SchemaRegistry.IncompatibleSchemaException] {
      reg.registerChecked("nation-value", v3bad)
    }
    assert(e.getMessage.contains("not Backward-compatible"))
    assert(reg.history("nation-value").size == before, "rejected schema must not be written")
    // the same evolution IS FORWARD-compatible (old readers ignore the
    // new field), so the forward gate admits it
    assert(reg.registerChecked("nation-value", v3bad, SchemaRegistry.Forward) > id2)
    // FULL requires both directions: this narrowing drops the
    // default-less n_extra (the v3 reader can't fill it) → rejected.
    // NOTE: it must differ textually from every registered version, or
    // the idempotent-skip path would (correctly) admit it unchecked.
    val v4 =
      """{"type":"record","name":"nation","fields":[
        |{"name":"n_nationkey","type":"int"},
        |{"name":"n_name","type":"string"}]}""".stripMargin
    intercept[SchemaRegistry.IncompatibleSchemaException] {
      reg.registerChecked("nation-value", v4, SchemaRegistry.Full)
    }
  }

  test("checked path rejects unparseable schemas even for a fresh subject") {
    val reg = SchemaRegistry.open(Files.createTempDirectory("reg-garbage").toString)
    val e = intercept[IllegalArgumentException] {
      reg.registerChecked("fresh-subject", "{ this is not avro")
    }
    assert(e.getMessage.contains("not valid Avro"))
    assert(reg.latest("fresh-subject").isEmpty, "garbage must not be written")
    // and the subject is NOT poisoned: a valid first version still lands
    assert(reg.registerChecked("fresh-subject", v1) > 0)
  }

  test("mixed-version framed stream decodes via per-record writer resolution") {
    val dir = Files.createTempDirectory("reg2").toString
    val reg = SchemaRegistry.open(dir)
    val id1 = reg.register("nation-value", v1)
    val id2 = reg.register("nation-value", v2)
    // one record written with v1, one with v2 (extra field on the wire)
    val b1 = AvroCodec.encodeNation(Iterator((1, "FRANCE", 3)), v1).next()
    val b2 = {
      val schema = new org.apache.avro.Schema.Parser().parse(v2)
      val rec = new org.apache.avro.generic.GenericData.Record(schema)
      rec.put("n_nationkey", 2); rec.put("n_name", "KENYA")
      rec.put("n_regionkey", 0); rec.put("n_comment", "extra")
      val out = new java.io.ByteArrayOutputStream()
      val enc = org.apache.avro.io.EncoderFactory.get().binaryEncoder(out, null)
      new org.apache.avro.generic.GenericDatumWriter[org.apache.avro.generic.GenericRecord](schema)
        .write(rec, enc)
      enc.flush()
      out.toByteArray
    }
    val framed = Iterator(SchemaFrame.frame(id1, b1), SchemaFrame.frame(id2, b2))
    // reader schema = v1: the v2 record's added field is dropped by Avro
    // schema resolution — exactly the Confluent consumer behavior
    val decoded = AvroCodec.decodeFramedNation(framed, reg.schemasById, v1).toList
    assert(decoded == List((1, "FRANCE", 3), (2, "KENYA", 0)))
    // unknown id fails loudly, not silently
    val bad = Iterator(SchemaFrame.frame(999, b1))
    intercept[IllegalStateException](
      AvroCodec.decodeFramedNation(bad, reg.schemasById, v1).toList)
  }

  test("registry over HTTP: Confluent v1 routes round-trip over a live socket") {
    val dir = Files.createTempDirectory("reg-http").toString
    val reg = SchemaRegistry.open(dir)
    val server = new RegistryServer(reg) // ephemeral port
    try {
      val client = new HttpRegistryClient(server.baseUrl)
      // register v1 then v2 over HTTP; idempotent re-register returns the
      // same id — Confluent semantics through the REST surface
      val id1 = client.register("nation-value", v1)
      val id2 = client.register("nation-value", v2)
      assert(id1 != id2)
      assert(client.register("nation-value", v1) == id1)
      // resolve by id (the consumer's frame-decode path) + latest + list
      assert(client.byId(id1).contains(v1))
      assert(client.byId(id2).contains(v2))
      assert(client.byId(99999).isEmpty) // 404, not an exception
      assert(client.latest("nation-value").contains((id2, v2)))
      assert(client.latest("nope").isEmpty)
      assert(client.subjects() == Seq("nation-value"))
      // the full produce/consume loop with the schema id fetched over
      // HTTP: frame with the HTTP-registered id, decode by resolving the
      // writer schema THROUGH the client — the reference's live-registry
      // flow end to end
      val payload = AvroCodec.encodeNation(Iterator((1, "FRANCE", 3)), v1).next()
      val framed = SchemaFrame.frame(id1, payload)
      val (wireId, body) = SchemaFrame.unframe(framed)
      val writerSchema = client.byId(wireId).get
      val decoded = AvroCodec.decodeFramedNation(
        Iterator(SchemaFrame.frame(wireId, body)),
        Map(wireId -> writerSchema), v1).toList
      assert(decoded == List((1, "FRANCE", 3)))
      // the HTTP surface applies the same compatibility gate the real
      // service does: an incompatible evolution is answered 409 and
      // nothing is written (the route used to call the UNCHECKED
      // register() and hand out an id the Confluent service refuses)
      val incompatible =
        """{"type":"record","name":"nation","fields":[
          |{"name":"n_nationkey","type":"int"},
          |{"name":"n_name","type":"string"},
          |{"name":"n_regionkey","type":"int"},
          |{"name":"n_comment","type":"string","default":""},
          |{"name":"n_http_extra","type":"string"}]}""".stripMargin
      val before = reg.history("nation-value").size
      val e409 = intercept[IllegalArgumentException](
        client.register("nation-value", incompatible))
      assert(e409.getMessage.contains("409"), e409.getMessage)
      assert(reg.history("nation-value").size == before)
      // HTTP registrations are durable in the same append-only log:
      // a fresh (non-HTTP) open of the dir replays them
      val replayed = SchemaRegistry.open(dir)
      assert(replayed.latest("nation-value").contains((id2, v2)))
    } finally server.stop()
  }

  test("per-subject compatibility modes over HTTP: NONE/BACKWARD/FORWARD/FULL semantics") {
    val dir = Files.createTempDirectory("reg-modes").toString
    val reg = SchemaRegistry.open(dir)
    val server = new RegistryServer(reg)
    try {
      val client = new HttpRegistryClient(server.baseUrl)
      // defaults: global GET answers BACKWARD, an unset subject 404s
      // (the service's strict no-defaultToGlobal form)
      assert(client.compatibility(None).contains("BACKWARD"))
      assert(client.compatibility(Some("s-fwd")).isEmpty)
      // an invalid level is refused (422), config unchanged
      val bad = intercept[IllegalArgumentException](
        client.setCompatibility(Some("s-fwd"), "SIDEWAYS"))
      assert(bad.getMessage.contains("422"), bad.getMessage)
      assert(client.compatibility(Some("s-fwd")).isEmpty)

      // widening evolution: add a default-less field. BACKWARD rejects
      // it (new reader can't fill it from old data), FORWARD admits it
      // (old readers ignore it)
      val widened =
        """{"type":"record","name":"nation","fields":[
          |{"name":"n_nationkey","type":"int"},
          |{"name":"n_name","type":"string"},
          |{"name":"n_regionkey","type":"int"},
          |{"name":"n_wide","type":"string"}]}""".stripMargin
      // subject s-fwd configured FORWARD-only
      assert(client.setCompatibility(Some("s-fwd"), "FORWARD") == "FORWARD")
      assert(client.compatibility(Some("s-fwd")).contains("FORWARD"))
      val fwdV1 = client.register("s-fwd", v1)
      assert(client.register("s-fwd", widened) > fwdV1,
        "FORWARD must admit a default-less widening")
      // the FORWARD-only REJECTION: narrowing away a default-less field
      // means old readers (on the wide schema) cannot read new data →
      // not forward-compatible, 409, nothing written
      val narrowed =
        """{"type":"record","name":"nation","fields":[
          |{"name":"n_nationkey","type":"int"},
          |{"name":"n_name","type":"string"}]}""".stripMargin
      val before = reg.history("s-fwd").size
      val e = intercept[IllegalArgumentException](client.register("s-fwd", narrowed))
      assert(e.getMessage.contains("409"), e.getMessage)
      assert(reg.history("s-fwd").size == before)

      // same widening under BACKWARD (the untouched default) → 409
      val bwdV1 = client.register("s-bwd", v1)
      val e2 = intercept[IllegalArgumentException](client.register("s-bwd", widened))
      assert(e2.getMessage.contains("409"), e2.getMessage)
      assert(bwdV1 > 0)

      // NONE: the same widening registers freely
      assert(client.setCompatibility(Some("s-none"), "NONE") == "NONE")
      val noneV1 = client.register("s-none", v1)
      assert(client.register("s-none", widened) > noneV1,
        "NONE must skip the gate entirely")

      // FULL: v2 (defaulted add) passes both directions; the default-less
      // widening fails the backward half
      assert(client.setCompatibility(Some("s-full"), "FULL") == "FULL")
      val fullV1 = client.register("s-full", v1)
      assert(client.register("s-full", v2) > fullV1)
      val e3 = intercept[IllegalArgumentException](client.register("s-full", widened))
      assert(e3.getMessage.contains("409"), e3.getMessage)

      // GLOBAL level governs subjects without an override: set global
      // NONE, a fresh subject takes the widening BACKWARD would refuse
      assert(client.setCompatibility(None, "NONE") == "NONE")
      assert(client.compatibility(None).contains("NONE"))
      val gV1 = client.register("s-global", v1)
      assert(client.register("s-global", widened) > gV1)
      // ...while a subject override still wins over global
      assert(reg.compatibilityOf("s-bwd") == SchemaRegistry.NoneCompat ||
        reg.getCompatibility(Some("s-bwd")).isEmpty,
        "s-bwd has no override; its effective level follows global")
      assert(reg.compatibilityOf("s-fwd") == SchemaRegistry.Forward)

      // config is durable: a fresh open of the same dir replays it
      val replayed = SchemaRegistry.open(dir)
      assert(replayed.getCompatibility(Some("s-fwd")).contains(SchemaRegistry.Forward))
      assert(replayed.getCompatibility(None).contains(SchemaRegistry.NoneCompat))
      assert(replayed.compatibilityOf("s-anything") == SchemaRegistry.NoneCompat)
    } finally server.stop()
  }
}
