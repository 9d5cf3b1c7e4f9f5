package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.Files

/** The reference's COMPLETE path in one flow (SURVEY §3.1 + §3.3):
  * change events as Debezium envelopes on the wire → channel subscribe →
  * envelope parse → unwrap (delete rewrite) → streaming JDBC upsert into
  * a real database (embedded Derby) — every stage the individual specs
  * prove, stitched end to end, checked against the engine's own batch
  * fold of the same history.
  */
class EndToEndSpec extends SparkSpec {

  System.setProperty("derby.system.home", Files.createTempDirectory("derby-e2e").toString)

  private val payloadSchema = StructType(Seq(
    StructField("id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  test("wire envelopes → parse → unwrap → upsertStream → Derby equals the batch fold") {
    val s = spark
    import s.implicits._
    val url = s"jdbc:derby:memory:e2e${java.util.UUID.randomUUID().toString.take(8)};create=true"
    val (wireDir, chk) = (Files.createTempDirectory("e2e-wire"), Files.createTempDirectory("e2e-chk"))

    // a 150-event history over 23 keys with creates/updates/deletes
    val feed = (0 until 150).map { i =>
      val op = if (i % 11 == 5) "d" else if (i < 23) "c" else "u"
      (i.toLong, (i % 23).toLong, op,
        s"t$i", (i * 37 % 991) / 10.0, "{}",
        java.sql.Timestamp.valueOf("2024-01-01 00:00:00"))
    }.toDF("scn", "id", "op", "event_type", "value", "props", "ts")
      .select(col("id"), col("event_type"), col("value"), col("props"),
        col("op"), col("ts"), col("scn"))

    // producer side: full Debezium envelopes as JSON lines on the wire,
    // in scn order across files (the Kafka per-key ordering contract)
    val lines = cdc.CdcQueries.envelopeOf(feed)
      .orderBy("source.scn")
      .select(to_json(struct(col("*"))).as("j")).as[String].collect()
    lines.grouped(50).zipWithIndex.foreach { case (g, i) =>
      val p = wireDir.resolve(s"w-$i.json")
      Files.write(p, String.join("\n", g.toSeq: _*).getBytes)
      Files.setLastModifiedTime(p,
        java.nio.file.attribute.FileTime.fromMillis(1700000000000L + i * 1000L))
    }

    // consumer side: channel → envelopes → unwrap → latest-per-key upsert
    val env = sources.ChangeChannel.envelopes(
      sources.FileChannel(wireDir.toString, maxFilesPerTrigger = 1).subscribe(s),
      payloadSchema)
    val unwrapped = cdc.Ops.unwrap(env)
      .select("id", "event_type", "value", "scn", "op") // drop __deleted: op drives deletes
    val q = sinks.JdbcUpsert.upsertStream(
      unwrapped, url, "e2e_state", keys = Seq("id"), ordering = Seq("scn"),
      checkpointDir = chk.toString)
    q.awaitTermination()

    val got = s.read.format("jdbc").option("url", url).option("dbtable", "e2e_state").load()
      .collect()
      .map(r => (r.getAs[Long]("ID"), r.getAs[Long]("SCN"),
        r.getAs[String]("EVENT_TYPE"), r.getAs[Double]("VALUE")))
      .toSet
    val want = cdc.Ops.applyChanges(
      feed.select("id", "event_type", "value", "scn", "op"),
      keys = Seq("id"), ordering = Seq("scn"))
      .collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[Long]("scn"),
        r.getAs[String]("event_type"), r.getAs[Double]("value")))
      .toSet
    assert(got == want)
    assert(got.nonEmpty, "vacuous end-to-end run")
  }

  test("curation capstone: gopher gate → exact dedup → substring scrub → line scrub on a planted corpus") {
    val s = spark
    import s.implicits._
    // Five 60-word docs engineered so each stage removes exactly one
    // known thing (every doc clears the Gopher word-count/length/alpha
    // gates except doc4, which lacks stopwords):
    //   doc1  unique prose — must survive the whole chain INTACT
    //   doc2  exact clone of doc1 — dropped at exact dedup (min-id rule)
    //   doc3  doc1's tokens 1..20 + 40 unique — the 20-token span is
    //         scrubbed (Lee et al. k=20), its unique tail survives
    //   doc4  no Gopher stopwords — dropped at the gate
    //   doc5  doc1's first 3-token chunk + 57 unique — the chunk is
    //         scrubbed by the C4 line rule (below substring's k, so only
    //         line dedup can catch it)
    def uniq(tag: String, from: Int, n: Int, stopAt: Set[Int]): Seq[String] =
      (from until from + n).map(i =>
        if (stopAt.contains(i - from)) (if ((i - from) % 2 == 0) "the" else "and")
        else s"$tag$i")
    val w1 = uniq("alpha", 1, 60, Set(30, 33))
    val w3 = w1.take(20) ++ uniq("gamma", 21, 40, Set(20, 23))
    val w4 = uniq("delta", 1, 60, Set.empty)
    val w5 = w1.take(3) ++ uniq("omega", 4, 57, Set(20, 23))
    val docs = Seq(
      (1L, w1.mkString(" ")), (2L, w1.mkString(" ")), (3L, w3.mkString(" ")),
      (4L, w4.mkString(" ")), (5L, w5.mkString(" ")))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    val dir = Files.createTempDirectory("capstone").toFile
    dir.deleteOnExit()
    docs.write.mode("overwrite").parquet(s"${dir.getAbsolutePath}/documents.parquet")

    // stage 1: Gopher gate (the oracle-checked id's own keep flag)
    val keepIds = SparkEntry.queries("gopher_rules")(s, dir.getAbsolutePath)
      .filter(col("keep")).select("doc_id").as[Long].collect().toSet
    assert(keepIds == Set(1L, 2L, 3L, 5L), s"gate: $keepIds")
    val gated = docs.filter(col("doc_id").isin(keepIds.toSeq: _*))

    // stage 2: exact dedup, min-id survivor
    val w = org.apache.spark.sql.expressions.Window.partitionBy("text")
    val exact = gated.withColumn("keep_id", min(col("doc_id")).over(w))
      .filter(col("doc_id") === col("keep_id")).drop("keep_id")
    assert(exact.select("doc_id").as[Long].collect().toSet == Set(1L, 3L, 5L))

    // stage 3: substring scrub (k=20) — doc3 loses exactly its copied span
    val scrubbed = llm.NearDedup.substringScrub(exact.select("doc_id", "text"), k = 20)
      .withColumnRenamed("scrubbed", "text")

    // stage 4: C4 first-occurrence line scrub — doc5 loses exactly the chunk
    val fin = llm.Curation.dedupLines(scrubbed)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fin(1L) == w1.mkString(" "), "doc1 must pass through the whole chain verbatim")
    assert(fin(3L) == w3.drop(20).mkString(" "),
      s"doc3 must keep exactly its unique tail: ${fin(3L)}")
    assert(fin(5L) == w5.drop(3).mkString(" "),
      s"doc5 must lose exactly the copied first chunk: ${fin(5L)}")
    assert(fin.keySet == Set(1L, 3L, 5L))
  }
}
