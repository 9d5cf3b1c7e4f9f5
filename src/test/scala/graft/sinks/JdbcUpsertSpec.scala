package graft.sinks

import graft.SparkSpec
import graft.cdc.{Ev, Ops}
import java.nio.file.Files

/** JDBC upsert sink vs embedded Derby: the sink's update-else-insert +
  * delete path must equal the engine's own applyChanges fold, batch and
  * streaming, and stay idempotent under redelivery.
  */
class JdbcUpsertSpec extends SparkSpec {

  System.setProperty("derby.system.home", Files.createTempDirectory("derby").toString)

  private def newUrl(): String =
    s"jdbc:derby:memory:db${java.util.UUID.randomUUID().toString.take(8)};create=true"

  private val events: Seq[Ev] = (0 until 120).map { i =>
    val op = if (i % 13 == 7) "d" else if (i < 17) "c" else "u"
    Ev(i.toLong, (i % 17).toLong, op, (i * 31 % 997) / 10.0)
  }

  private def readTable(url: String, table: String) =
    // Derby up-folds UNQUOTED identifiers (id→ID, scn→SCN); `value` is a
    // reserved word, so the sink quotes it — but folded to Derby's
    // unquoted-fold case first ("VALUE"), so the created schema is
    // case-UNIFORM: a consumer reading every column upper-cased works
    spark.read.format("jdbc").option("url", url).option("dbtable", table).load()
      .collect().map(r => (r.getAs[Long]("ID"), r.getAs[Long]("SCN"), r.getAs[Double]("VALUE")))
      .toSet

  private def expected(evs: Seq[Ev]) = {
    val s = spark
    import s.implicits._
    Ops.applyChanges(evs.toDF(), keys = Seq("id"), ordering = Seq("scn"))
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Long]("scn"), r.getAs[Double]("value")))
      .toSet
  }

  test("two upsert batches + redelivery equal the applyChanges fold") {
    val s = spark
    import s.implicits._
    val url = newUrl()
    val (b1, b2) = events.splitAt(70)
    val schema = org.apache.spark.sql.types.StructType(
      b1.toDF().schema.filterNot(_.name == "op"))
    JdbcUpsert.ensureTable(url, "sink_state", schema, keys = Seq("id"))
    JdbcUpsert.upsert(Ops.latestPerKey(b1.toDF(), Seq("id"), Seq("scn")),
      url, "sink_state", Seq("id"), opCol = Some("op"), ordCols = Seq("scn"))
    assert(readTable(url, "sink_state") == expected(b1))
    val latest2 = Ops.latestPerKey(b2.toDF(), Seq("id"), Seq("scn"))
    JdbcUpsert.upsert(latest2, url, "sink_state", Seq("id"), opCol = Some("op"),
      ordCols = Seq("scn"))
    // NOTE: keys deleted in b2 but live in b1 must be gone; keys only in
    // b1 must survive — the cross-batch CDC contract
    assert(readTable(url, "sink_state") == expected(events))
    // redelivery of the same reduced batch is a no-op (idempotence)
    JdbcUpsert.upsert(latest2, url, "sink_state", Seq("id"), opCol = Some("op"),
      ordCols = Seq("scn"))
    assert(readTable(url, "sink_state") == expected(events))
  }

  test("null and oversized string payloads survive the sink (typed nulls + CLOB)") {
    val s = spark
    import s.implicits._
    val url = newUrl()
    val big = "x" * 10000 // larger than any sane VARCHAR default
    val df = Seq(
      (1L, Option("short"), 1L, "c"),
      (2L, None: Option[String], 2L, "c"), // null payload: typed setNull, not untyped setObject
      (3L, Option(big), 3L, "c")
    ).toDF("id", "txt", "scn", "op")
    JdbcUpsert.ensureTable(url, "clob_t",
      org.apache.spark.sql.types.StructType(df.schema.filterNot(_.name == "op")), Seq("id"))
    JdbcUpsert.upsert(df, url, "clob_t", Seq("id"), opCol = Some("op"), ordCols = Seq("scn"))
    val got = s.read.format("jdbc").option("url", url).option("dbtable", "clob_t").load()
      .collect().map(r => r.getAs[Long]("ID") -> Option(r.getAs[String]("TXT"))).toMap
    assert(got(1L).contains("short"))
    assert(got(2L).isEmpty, "null payload must round-trip as NULL")
    assert(got(3L).exists(_.length == 10000), "oversized text must not truncate or poison the batch")
  }

  test("composite ordering guard: a redelivery tying on the head column cannot regress") {
    val s = spark
    import s.implicits._
    val url = newUrl()
    val mk = (scn: Long, ts: Long, v: String) => (1L, scn, ts, v, "c")
    val df0 = Seq(mk(5L, 10L, "new")).toDF("id", "scn", "ts2", "v", "op")
    JdbcUpsert.ensureTable(url, "guard_t",
      org.apache.spark.sql.types.StructType(df0.schema.filterNot(_.name == "op")), Seq("id"))
    JdbcUpsert.upsert(df0, url, "guard_t", Seq("id"), opCol = Some("op"),
      ordCols = Seq("scn", "ts2"))
    // stale redelivery TIES on scn but is older on the tiebreak column —
    // a head-only guard (scn <= 5) would have let it overwrite
    val stale = Seq(mk(5L, 3L, "old")).toDF("id", "scn", "ts2", "v", "op")
    JdbcUpsert.upsert(stale, url, "guard_t", Seq("id"), opCol = Some("op"),
      ordCols = Seq("scn", "ts2"))
    val v = s.read.format("jdbc").option("url", url).option("dbtable", "guard_t").load()
      .collect().map(_.getAs[String]("V")).head
    assert(v == "new", s"stale tie-on-head redelivery regressed the sink to '$v'")
  }

  test("streaming upsertStream delivers the same state as batch fold") {
    val s = spark
    import s.implicits._
    val url = newUrl()
    val (in, chk) = (Files.createTempDirectory("jin"), Files.createTempDirectory("jchk"))
    events.grouped(40).zipWithIndex.foreach { case (g, i) =>
      val lines = g.map(e =>
        s"""{"scn":${e.scn},"id":${e.id},"op":"${e.op}","value":${e.value}}""")
      val p = in.resolve(s"p-$i.json")
      Files.write(p, String.join("\n", lines: _*).getBytes)
      // the file channel stands in for Kafka, whose per-key ORDER the
      // reference sink relies on: FileStreamSource orders by mtime, so
      // give each file a distinct, increasing mtime (same-ms writes
      // otherwise arrive in nondeterministic order)
      Files.setLastModifiedTime(p,
        java.nio.file.attribute.FileTime.fromMillis(1700000000000L + i * 1000L))
    }
    val feedSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("scn", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("op", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("value", org.apache.spark.sql.types.DoubleType)))
    val feed = s.readStream.schema(feedSchema).option("maxFilesPerTrigger", 1).json(in.toString)
    val q = JdbcUpsert.upsertStream(feed, url, "stream_state", Seq("id"), Seq("scn"),
      chk.toString)
    q.awaitTermination()
    assert(readTable(url, "stream_state") == expected(events))
  }

  test("schema-qualified table name resolves schema.table, not one dotted identifier") {
    val s = spark
    import s.implicits._
    val url = newUrl()
    val df = Seq((1L, 7L, "a", "c"), (2L, 8L, "b", "c")).toDF("id", "scn", "v", "op")
    val schema = org.apache.spark.sql.types.StructType(df.schema.filterNot(_.name == "op"))
    // Derby auto-creates the schema on first CREATE by the owner; the
    // point is that app.state reaches JDBC as APP.STATE (two identifiers),
    // not the single quoted identifier "APP.STATE"
    JdbcUpsert.ensureTable(url, "app.sink_state", schema, Seq("id"))
    JdbcUpsert.upsert(df, url, "app.sink_state", Seq("id"), opCol = Some("op"),
      ordCols = Seq("scn"))
    val got = s.read.format("jdbc").option("url", url)
      .option("dbtable", "APP.SINK_STATE").load()
      .collect().map(r => r.getAs[Long]("ID") -> r.getAs[String]("V")).toMap
    assert(got == Map(1L -> "a", 2L -> "b"))
    // empty dot-parts must fail loudly, not misresolve
    intercept[IllegalArgumentException] {
      JdbcUpsert.ensureTable(url, "app..t", schema, Seq("id"))
    }
    intercept[IllegalArgumentException] {
      JdbcUpsert.ensureTable(url, ".t", schema, Seq("id"))
    }
  }

  test("reserved-word columns beside plain columns create a case-uniform schema") {
    val s = spark
    import s.implicits._
    val url = newUrl()
    // `order` and `value` are reserved (quoted, FOLD-cased); id/scn plain
    // (bare, Derby up-folds). The round-11 regression created a
    // mixed-case surface (ID, "value", SCN); the contract now is that a
    // consumer addressing EVERY column by the dialect's fold case works.
    val df = Seq((1L, 3L, 2.5, 9L, "c"), (2L, 4L, 7.5, 8L, "c"))
      .toDF("id", "order", "value", "scn", "op")
    val schema = org.apache.spark.sql.types.StructType(df.schema.filterNot(_.name == "op"))
    JdbcUpsert.ensureTable(url, "mixed_t", schema, Seq("id"))
    JdbcUpsert.upsert(df, url, "mixed_t", Seq("id"), opCol = Some("op"), ordCols = Seq("scn"))
    val got = s.read.format("jdbc").option("url", url).option("dbtable", "mixed_t").load()
    assert(got.schema.fieldNames.toSeq == Seq("ID", "ORDER", "VALUE", "SCN"),
      s"created schema is not case-uniform: ${got.schema.fieldNames.mkString(",")}")
    val rows = got.collect()
      .map(r => (r.getAs[Long]("ID"), r.getAs[Long]("ORDER"), r.getAs[Double]("VALUE"))).toSet
    assert(rows == Set((1L, 3L, 2.5), (2L, 4L, 7.5)))
    // update path exercises the quoted SET/WHERE spellings too
    val upd = Seq((1L, 30L, 25.0, 10L, "u")).toDF("id", "order", "value", "scn", "op")
    JdbcUpsert.upsert(upd, url, "mixed_t", Seq("id"), opCol = Some("op"), ordCols = Seq("scn"))
    val after = s.read.format("jdbc").option("url", url).option("dbtable", "mixed_t").load()
      .collect().map(r => r.getAs[Long]("ID") -> r.getAs[Double]("VALUE")).toMap
    assert(after == Map(1L -> 25.0, 2L -> 7.5))
  }

  test("a table created by unquoted DDL keeps resolving (fold-case quoting = native fold)") {
    val s = spark
    import s.implicits._
    val url = newUrl()
    // simulate a pre-existing sink table created OUTSIDE the sink with a
    // plain unquoted CREATE — Derby stores ID/SCN/VALUE upper. The sink's
    // quoted "VALUE" must hit that same column, and ensureTable must see
    // the table as existing (no duplicate CREATE).
    val conn = java.sql.DriverManager.getConnection(url)
    try conn.createStatement().execute(
      "CREATE TABLE legacy_t (id BIGINT PRIMARY KEY, \"VALUE\" DOUBLE, scn BIGINT)")
    finally conn.close()
    val df = Seq((1L, 5.5, 2L, "c")).toDF("id", "value", "scn", "op")
    val schema = org.apache.spark.sql.types.StructType(df.schema.filterNot(_.name == "op"))
    JdbcUpsert.ensureTable(url, "legacy_t", schema, Seq("id")) // must NOT re-CREATE
    JdbcUpsert.upsert(df, url, "legacy_t", Seq("id"), opCol = Some("op"), ordCols = Seq("scn"))
    val got = s.read.format("jdbc").option("url", url).option("dbtable", "legacy_t").load()
      .collect().map(r => r.getAs[Long]("ID") -> r.getAs[Double]("VALUE")).toMap
    assert(got == Map(1L -> 5.5))
  }
  test("a malformed pre-quoted identifier is rejected, not spliced into SQL") {
    val s = spark
    import s.implicits._
    val url = newUrl()
    // the pre-quoted escape hatch passes validated identifiers verbatim;
    // an interior unpaired quote is a breakout attempt and must throw
    // BEFORE any SQL text is built
    val evil = "\"v\" DOUBLE); DROP TABLE t;--\""
    val df = Seq((1L, 2.5, 1L, "c")).toDF("id", evil, "scn", "op")
    val schema = org.apache.spark.sql.types.StructType(df.schema.filterNot(_.name == "op"))
    val e = intercept[IllegalArgumentException] {
      JdbcUpsert.ensureTable(url, "inj_t", schema, Seq("id"))
    }
    assert(e.getMessage.contains("pre-quoted"), s"wrong failure: ${e.getMessage}")
    // properly doubled interior quotes still pass through
    val okCol = "\"we\"\"ird\""
    val df2 = Seq((1L, 2.5, 1L, "c")).toDF("id", okCol, "scn", "op")
    val schema2 = org.apache.spark.sql.types.StructType(df2.schema.filterNot(_.name == "op"))
    JdbcUpsert.ensureTable(url, "inj_ok_t", schema2, Seq("id"))
    JdbcUpsert.upsert(df2, url, "inj_ok_t", Seq("id"), opCol = Some("op"), ordCols = Seq("scn"))
    val got = spark.read.format("jdbc").option("url", url)
      .option("dbtable", "inj_ok_t").load().collect()
    assert(got.length == 1 && got(0).getAs[Long]("ID") == 1L)
  }
}
