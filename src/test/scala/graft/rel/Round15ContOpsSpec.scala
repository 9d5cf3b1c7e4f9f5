package graft.rel

import graft.{SparkEntry, SparkSpec, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-15 continuation operators: the bin-bucketed interval join, the
  * skew-safe per-domain quota, the ANN recall eval, and the portable
  * HLL's mergeability (the property that makes its map-side combine a
  * correct distributed sketch union).
  */
class Round15ContOpsSpec extends SparkSpec {

  test("join_interval equals the naive theta self-join at sf0.001") {
    val s = spark
    val got = SparkEntry.queries("join_interval")(s, sf("sf0.001"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // naive reference: sessions via the same gap rule, then a cross
    // filter — O(n²) is fine on the 946-session fixture
    val byTs = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val cum = byTs.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val sess = Tables(s, sf("sf0.001")).events
      .withColumn("ms", unix_millis(col("ts").cast("timestamp")))
      .withColumn("prev_ms", lag(col("ms"), 1).over(byTs))
      .withColumn("brk",
        when(col("prev_ms").isNull || col("ms") - col("prev_ms") > 1800000L, 1L)
          .otherwise(0L))
      .withColumn("seq", sum(col("brk")).over(cum))
      .groupBy("user_id", "seq")
      .agg(min(col("ms")).as("st"), max(col("ms")).as("en"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val naive = sess.map { case (u, q, st, en) =>
      (u, q) -> sess.count { case (u2, _, st2, en2) =>
        u2 != u && st <= en2 && st2 <= en
      }.toLong
    }.toMap
    assert(got.size == naive.size)
    naive.foreach { case (k, n) => assert(got(k) == n, s"session $k") }
    assert(got.values.exists(_ > 0L), "fixture should have some overlap")
    assert(got.values.exists(_ == 0L), "fixture should have lone sessions")
  }

  test("domain_cap: two-level rank equals the direct per-source top-K and caps at 10") {
    val s = spark
    val got = SparkEntry.queries("domain_cap")(s, sf("sf0.001"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val direct = Tables(s, sf("sf0.001")).documents
      .select(col("doc_id"), col("source"),
        md5(col("doc_id").cast("string")).as("hk"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("source")).orderBy(col("hk"), col("doc_id")))
        .cast("long"))
      .filter(col("rk") <= 10)
      .collect().map(r => (r.getAs[String]("source"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("rk")))
    assert(got.toSet == direct.toSet)
    got.groupBy(_._1).foreach { case (src, rows) =>
      assert(rows.length <= 10, s"$src over cap")
    }
  }

  test("ann_recall agrees with an independent intersection of the two searches") {
    val s = spark
    val got = SparkEntry.queries("ann_recall")(s, sf("sf0.001"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got.keySet == (0L until 8L).toSet)
    val truth = SparkEntry.queries("sim_topk")(s, sf("sf0.001"))
      .select("q_id", "c_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = SparkEntry.queries("ann_ivf")(s, sf("sf0.001"))
      .select("q_id", "c_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    (0L until 8L).foreach { q =>
      val n = (truth.filter(_._1 == q).map(_._2)
        intersect approx.filter(_._1 == q).map(_._2)).size.toLong
      val (nh, rec) = got(q)
      assert(nh == n, s"q=$q")
      assert(rec == math.round(n / 10.0 * 1e6) / 1e6 && rec >= 0.0 && rec <= 1.0)
    }
  }

  test("ts_downsample bars equal a naive in-JVM OHLC fold") {
    val s = spark
    val got = SparkEntry.queries("ts_downsample")(s, sf("sf0.001"))
      .collect().map(r => r.get(0).toString ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    val ev = Tables(s, sf("sf0.001")).events
      .select(window(col("ts"), "1 hour").getField("start").as("bucket"),
        round(col("value") * 100).cast("long").as("cents"),
        (unix_millis(col("ts").cast("timestamp")) * 4194304L + col("event_id")).as("k"))
      .collect().map(r => (r.get(0).toString, r.getLong(1), r.getLong(2)))
    val naive = ev.groupBy(_._1).map { case (b, rows) =>
      val byK = rows.sortBy(_._3)
      b -> (byK.head._2, rows.map(_._2).max, rows.map(_._2).min,
        byK.last._2, rows.length.toLong, rows.map(_._2).sum)
    }
    assert(got.size == naive.size)
    naive.foreach { case (b, bar) => assert(got(b) == bar, s"bucket $b") }
  }

  test("dedup_recall metrics equal an independent intersection of the two pair sets") {
    val s = spark
    val Array(row) = SparkEntry.queries("dedup_recall")(s, sf("sf0.001")).collect()
    val truth = SparkEntry.queries("dedup_jaccard")(s, sf("sf0.001"))
      .select("doc1", "doc2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val found = SparkEntry.queries("dedup_near")(s, sf("sf0.001"))
      .select("doc1", "doc2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val hit = (truth intersect found).size.toLong
    assert(row.getLong(0) == truth.size.toLong)
    assert(row.getLong(1) == found.size.toLong)
    assert(row.getLong(2) == hit)
    assert(truth.nonEmpty, "fixture should have exact pairs (metric non-vacuous)")
    assert(row.getDouble(3) == math.round(hit.toDouble / truth.size * 1e6) / 1e6)
    assert(row.getDouble(4) == math.round(hit.toDouble / found.size * 1e6) / 1e6)
  }

  test("vocab_prune: monotone compression curve, v=0 is char-level, v=16 matches bpe_encode") {
    val s = spark
    val rows = SparkEntry.queries("vocab_prune")(s, sf("sf0.001"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(rows.map(_._1).toSeq == Seq(0L, 8L, 16L))
    // more merges → strictly fewer tokens, more learned units
    assert(rows.sliding(2).forall { case Array(a, b) => b._2 < a._2 && b._3 > a._3 })
    assert(rows.head._3 == 0L, "zero merges cannot produce learned units")
    rows.foreach { r =>
      assert(r._5 == math.round(r._2.toDouble / r._4 * 1e6) / 1e6)
      assert(r._5 >= 1.0, "word-based BPE never merges across words")
    }
    // the full-table arm IS the bpe_encode model: totals must agree
    val enc = SparkEntry.queries("bpe_encode")(s, sf("sf0.001"))
      .agg(sum(col("n_tokens")), sum(col("n_merged"))).collect()(0)
    assert(rows.last._2 == enc.getLong(0) && rows.last._3 == enc.getLong(1))
  }

  test("quality_calibration equals the cross-tab of its two parent signals") {
    val s = spark
    val got = SparkEntry.queries("quality_calibration")(s, sf("sf0.001"))
      .collect().map(r => (r.getLong(0), r.getBoolean(1)) -> r.getLong(2)).toMap
    // bands via the exact-integer micro-unit reimplementation (round
    // 16: the engine's band key is BIGINT rational, never round(float))
    val band = Tables(s, sf("sf0.001")).documents
      .select(col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) ->
        graft.llm.ExactQualityKit.qualityE6(r.getString(1)).get / 100000L).toMap
    val keep = SparkEntry.queries("gopher_rules")(s, sf("sf0.001"))
      .collect().map(r => r.getLong(0) -> r.getAs[Boolean]("keep")).toMap
    val naive = band.keys.groupBy(d => (band(d), keep(d)))
      .map { case (k, ds) => k -> ds.size.toLong }
    assert(got == naive)
    // non-vacuous: the two signals must actually disagree somewhere
    assert(got.keys.map(_._2).toSet == Set(true, false))
  }

  test("embed_truncate: hits recount independently per dim, d=64 is the recall-1.0 anchor") {
    val s = spark
    val got = SparkEntry.queries("embed_truncate")(s, sf("sf0.001"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got.keySet == Set(8L, 16L, 32L, 64L))
    assert(got(64L) == ((80L, 1.0)), "full-dim arm must equal its own truth")
    got.values.foreach { case (h, r) =>
      assert(h >= 0L && h <= 80L && r == math.round(h / 80.0 * 1e6) / 1e6)
    }
    // independent recount at one truncation: brute prefix-16 top-10 per
    // query intersected with full-dim top-10
    val emb = Tables(s, sf("sf0.001")).embeddings
      .collect().map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double], d: Int): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < d) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      dot / math.sqrt(na) / math.sqrt(nb)
    }
    def top10(q: Long, d: Int): Set[Long] =
      emb.keys.filter(_ != q).toSeq
        .map(c => (cos(emb(q), emb(c), d), c))
        .sortBy { case (s0, c) => (-s0, c) }.take(10).map(_._2).toSet
    val hits16 = (0L until 8L).map(q => (top10(q, 16) intersect top10(q, 64)).size).sum
    assert(got(16L)._1 == hits16.toLong)
  }

  test("domain_cap_tokens: two-level cumulative equals the direct window, prefix maximal, budget bites") {
    val s = spark
    val got = SparkEntry.queries("domain_cap_tokens")(s, sf("sf0.001"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // direct one-window reference in-JVM
    val toks = Tables(s, sf("sf0.001")).documents
      .select(col("source"), col("doc_id"),
        size(filter(split(col("text"), " "), w => length(w) > 0)).cast("long").as("nt"),
        md5(col("doc_id").cast("string")).as("hk"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val direct = toks.groupBy(_._1).toSeq.flatMap { case (src, rows) =>
      var cum = 0L
      rows.sortBy(r => (r._4, r._2)).iterator.map { r =>
        cum += r._3; (src, r._2, r._3, cum)
      }.takeWhile(_._4 <= 500L)
    }
    assert(got.toSet == direct.toSet)
    got.groupBy(_._1).foreach { case (src, rows) =>
      assert(rows.map(_._4).max <= 500L, s"$src over budget")
    }
    // the budget must actually bite (kept strictly fewer docs than raw)
    val totalBySrc = toks.groupBy(_._1).view.mapValues(_.size).toMap
    assert(got.groupBy(_._1).exists { case (src, rows) => rows.size < totalBySrc(src) })
  }

  test("domain_cap_tokens keeps stage-1 crossing docs: salt-local drop before a later-hk doc stays exact") {
    val s = spark
    import s.implicits._
    // Construct the round-16 advisory counterexample ON PURPOSE: three
    // docs A <hk B <hk C in ONE source with salt(A)==salt(B)!=salt(C)
    // and tokens 400/200/90 under budget 500. The one-window truth
    // keeps only A (B crosses at 600, C's true cum is 690). The
    // pre-fix engine dropped B at stage 1 (lcum 600 > 500) and then
    // under-counted C's stage-2 cumulative as 490 — wrongly keeping C.
    def md5hex(id: Long): String = java.security.MessageDigest
      .getInstance("MD5").digest(id.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    def salt(id: Long): Long = java.lang.Long.parseLong(md5hex(id).take(4), 16) % 16
    val byHk = (1L to 400L).sortBy(md5hex)
    val ida = byHk.head
    val idb = byHk.tail.find(id => salt(id) == salt(ida))
      .getOrElse(fail("no same-salt partner found"))
    val idc = byHk.dropWhile(_ != idb).tail.find(id => salt(id) != salt(ida))
      .getOrElse(fail("no other-salt successor found"))
    def words(n: Int) = Seq.fill(n)("w").mkString(" ")
    val dir = graft.Engine.scratchDir("dctok")
    Seq((ida, words(400)), (idb, words(200)), (idc, words(90)))
      .toDF("doc_id", "text").withColumn("source", lit("s0"))
      .write.parquet(s"$dir/documents.parquet")
    val kept = SparkEntry.queries("domain_cap_tokens")(s, dir.toString)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(ida),
      s"must keep exactly the one-window prefix {A=$ida}, got $kept (B=$idb C=$idc)")
  }

  test("portable HLL registers merge by max (sketch union = distributed combine)") {
    val s = spark
    // registers of the even/odd halves vs the full column, built with
    // the query's own hash/rank arithmetic
    def regs(pred: org.apache.spark.sql.Column): Map[Long, Long] = {
      val h = md5(concat(lit("hll:"), col("l_partkey").cast("string")))
      Tables(s, sf("sf0.001")).lineitem.filter(pred)
        .select(
          (conv(substring(h, 1, 2), 16, 10).cast("long") % 64).as("b"),
          conv(substring(h, 3, 11), 16, 10).cast("long").as("rest"))
        .select(col("b"),
          when(col("rest") === 0L, lit(45L))
            .otherwise(lit(45L) - length(bin(col("rest"))).cast("long")).as("r"))
        .groupBy("b").agg(max("r").as("mr"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    val even = regs(col("l_orderkey") % 2 === 0)
    val odd = regs(col("l_orderkey") % 2 === 1)
    val full = regs(lit(true))
    val merged = (even.keySet ++ odd.keySet).map { b =>
      b -> math.max(even.getOrElse(b, 0L), odd.getOrElse(b, 0L))
    }.toMap
    assert(merged == full)
  }
}
