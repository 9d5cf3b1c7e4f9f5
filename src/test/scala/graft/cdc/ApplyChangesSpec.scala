package graft.cdc

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests for the materialization operator (SURVEY.md §5.2):
  * (a) applyChanges ≡ an in-order row-by-row fold;
  * (b) apply(prefix) then apply(suffix over result) ≡ apply(whole)
  *     — checkpoint soundness;
  * (c) delete-then-insert ≠ update (tombstone semantics);
  * (d) idempotence under duplicate delivery.
  *
  * Generators are driven with fixed seeds (no scalatestplus bridge in
  * the offline dependency set) — failures are reproducible by seed.
  */
case class Ev(scn: Long, id: Long, op: String, value: Double)

class ApplyChangesSpec extends SparkSpec {

  private def feedOf(evs: Seq[Ev]): DataFrame = {
    val s = spark
    import s.implicits._
    evs.toDF()
  }

  private def applied(evs: Seq[Ev]): Map[Long, (Long, String, Double)] =
    Ops
      .applyChanges(feedOf(evs), keys = Seq("id"), ordering = Seq("scn"))
      .collect()
      .map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("scn"), r.getAs[String]("op"), r.getAs[Double]("value"))))
      .toMap

  /** Reference semantics: fold events in scn order; 'd' removes the key. */
  private def fold(evs: Seq[Ev]): Map[Long, (Long, String, Double)] =
    evs.sortBy(_.scn).foldLeft(Map.empty[Long, (Long, String, Double)]) {
      case (m, e) if e.op == "d" => m - e.id
      case (m, e)                => m.updated(e.id, (e.scn, e.op, e.value))
    }

  private val genEvs: Gen[List[Ev]] = for {
    n <- Gen.chooseNum(0, 60)
    ops <- Gen.listOfN(n, for {
      id <- Gen.chooseNum(0L, 7L)
      op <- Gen.oneOf("c", "u", "d", "r")
      v <- Gen.chooseNum(0, 10000).map(_ / 100.0)
    } yield (id, op, v))
  } yield ops.zipWithIndex.map { case ((id, op, v), i) => Ev(i.toLong, id, op, v) }

  private def samples(n: Int): Seq[List[Ev]] =
    (1 to n).flatMap(i => genEvs.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("(a) applyChanges equals the in-order fold") {
    samples(25).foreach { evs =>
      assert(applied(evs) == fold(evs), s"mismatch for ${evs.take(5)}...")
    }
  }

  test("(b) prefix+suffix application equals whole-stream application") {
    samples(15).zipWithIndex.foreach { case (evs, i) =>
      val cut = if (evs.isEmpty) 0 else (i * 7) % (evs.size + 1)
      val (pre, post) = evs.splitAt(cut)
      // state after prefix, re-injected as feed rows ahead of the suffix
      // (exactly what Stream.materialize does per micro-batch)
      val preState = applied(pre).map { case (id, (scn, op, v)) => Ev(scn, id, op, v) }.toSeq
      assert(applied(preState ++ post) == fold(evs), s"cut=$cut")
    }
  }

  test("(c) delete-then-insert is not an update: tombstone removes history") {
    val evs = Seq(Ev(1, 1, "c", 1.0), Ev(2, 1, "d", 1.0), Ev(3, 1, "c", 9.0))
    assert(applied(evs) == Map(1L -> ((3L, "c", 9.0))))
    assert(applied(evs :+ Ev(4, 1, "d", 9.0)) == Map.empty)
  }

  test("(d) idempotent under duplicate delivery") {
    samples(15).foreach { evs =>
      assert(applied(evs ++ evs) == applied(evs))
    }
  }

  private def stateAsOfMap(evs: Seq[Ev], asOf: Long): Map[Long, (Long, String, Double)] =
    Ops.stateAsOf(feedOf(evs), keys = Seq("id"), scnCol = "scn", opCol = "op",
        asOf = org.apache.spark.sql.functions.lit(asOf))
      .collect()
      .map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("scn"), r.getAs[String]("op"), r.getAs[Double]("value"))))
      .toMap

  test("(e) stateAsOf(max scn) ≡ applyChanges; earlier SCNs ≡ fold of the prefix") {
    samples(15).foreach { evs =>
      if (evs.nonEmpty) {
        val maxScn = evs.map(_.scn).max
        assert(stateAsOfMap(evs, maxScn) == applied(evs), "as-of max must equal apply_changes")
        // flashback to the midpoint = folding only events at or before it
        val mid = maxScn / 2
        assert(stateAsOfMap(evs, mid) == fold(evs.filter(_.scn <= mid)), s"as-of $mid")
      }
    }
  }

  test("(f) stateHistory materialized once serves k probes with NO window re-run, ≡ stateAsOf") {
    import org.apache.spark.sql.functions.lit
    val evs = samples(3).flatten
    // materialize-once: the SCD2 window runs during THIS persist+count,
    // never again for any probe
    val history = Ops.stateHistory(feedOf(evs), keys = Seq("id"),
      scnCol = "scn", opCol = "op").persist()
    try {
      history.count()
      val probes = Seq(0L, evs.map(_.scn).max / 2, evs.map(_.scn).max)
      probes.foreach { asOf =>
        val probe = Ops.probeState(history, "op", lit(asOf))
        // plan-level: the probe over the materialized history must be a
        // scan+filter — a Window node ABOVE the cache boundary would mean
        // the history recomputed per probe (the InMemoryRelation's stored
        // description still shows the window that BUILT the cache; only
        // the plan above it executes per probe)
        val plan = probe.queryExecution.executedPlan.toString
        val aboveCache = plan.split("InMemoryRelation")(0)
        assert(aboveCache.contains("InMemoryTableScan"),
          s"probe at $asOf did not read the materialized history:\n$plan")
        assert(!aboveCache.contains("Window"),
          s"probe at $asOf re-ran the window:\n$plan")
        val got = probe.collect()
          .map(r => r.getAs[Long]("id") ->
            ((r.getAs[Long]("scn"), r.getAs[String]("op"), r.getAs[Double]("value"))))
          .toMap
        assert(got == fold(evs.filter(_.scn <= asOf)), s"probe at $asOf")
      }
    } finally { history.unpersist(); () }
  }

  test("(g) bucketChecksum equals the in-JVM fold summary; any single-row drift flips exactly its bucket") {
    import org.apache.spark.sql.functions.{col, concat_ws}
    val s = spark
    import s.implicits._
    val evs = samples(4).flatten
    val state = Ops.applyChanges(feedOf(evs), keys = Seq("id"), ordering = Seq("scn"))
    def summarize(st: org.apache.spark.sql.DataFrame): Map[Long, (Long, Long)] =
      Ops.bucketChecksum(st, "id",
          concat_ws("|", col("id"), col("scn"), col("op"),
            col("value").cast("decimal(18,2)")), buckets = 8)
        .collect()
        .map(r => r.getAs[Long]("bucket") ->
          ((r.getAs[Long]("n_rows"), r.getAs[Long]("checksum")))).toMap
    // independent re-derivation: fold → canonical strings → md5/56 → xor
    def h56(x: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      java.lang.Long.parseLong(
        md.digest(x.getBytes("UTF-8")).take(7).map("%02x".format(_)).mkString, 16)
    }
    val folded = fold(evs).toSeq.map { case (id, (scn, op, v)) =>
      // BigDecimal.valueOf = Double.toString semantics — the same
      // shortest-repr path Spark's double→decimal cast takes
      (id % 8, h56(s"$id|$scn|$op|${java.math.BigDecimal.valueOf(v)
        .setScale(2, java.math.RoundingMode.HALF_UP)}"))
    }
    val expected = folded.groupBy(_._1).map { case (b, hs) =>
      b -> ((hs.size.toLong, hs.map(_._2).reduce(_ ^ _)))
    }
    val got = summarize(state)
    assert(got == expected, "checksum summary diverges from the in-JVM fold")
    // detection: drop one row → only its bucket's count changes; mutate
    // one row's value → only its bucket's checksum changes (counts equal)
    val victim = state.orderBy("id").limit(1).collect()(0)
    val vid = victim.getAs[Long]("id"); val vb = vid % 8
    val dropped = summarize(state.filter(col("id") =!= vid))
    // a 1-row bucket disappears outright when its row is dropped — still
    // a detected divergence (summary rows differ)
    assert(dropped.get(vb) != Some(got(vb)) &&
        dropped.get(vb).forall(d => d._1 == got(vb)._1 - 1 && d._2 != got(vb)._2),
      "dropped row undetected in its bucket")
    assert((got - vb).forall { case (b, v) => dropped.get(b).contains(v) },
      "a drop in one bucket disturbed another bucket's summary")
    val mutated = summarize(state.withColumn("value",
      org.apache.spark.sql.functions.when(col("id") === vid, col("value") + 0.01)
        .otherwise(col("value"))))
    assert(mutated(vb)._1 == got(vb)._1 && mutated(vb)._2 != got(vb)._2,
      "mutated value undetected")
    assert((got - vb) == (mutated - vb),
      "a mutation in one bucket disturbed another bucket's summary")
  }

  test("(h) updateChecksum: incremental XOR maintenance equals the full recompute at every step; identity on no-op") {
    import org.apache.spark.sql.functions.{col, concat_ws}
    val rowStr = concat_ws("|", col("id"), col("scn"), col("op"),
      col("value").cast("decimal(18,2)"))
    def full(st: org.apache.spark.sql.DataFrame) =
      Ops.bucketChecksum(st, "id", rowStr, buckets = 8)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("bucket"),
        r.getAs[Long]("n_rows"), r.getAs[Long]("checksum"))).toSet
    val evs = samples(5).flatten
    assert(evs.nonEmpty)
    val cut1 = evs.length / 3; val cut2 = 2 * evs.length / 3
    val (b0, b1, b2) = (evs.take(cut1), evs.slice(cut1, cut2), evs.drop(cut2))
    var state = Ops.applyChanges(feedOf(b0), keys = Seq("id"), ordering = Seq("scn"))
    var summary = full(state)
    Seq(b1, b2).foreach { b =>
      val applied = state.columns.toSeq
      val batch = feedOf(b).select(applied.map(col): _*)
      val touched = batch.select("id").distinct()
      val before = state.join(touched, Seq("id"), "left_semi")
      val next = Ops.applyChanges(state.unionByName(batch),
        keys = Seq("id"), ordering = Seq("scn"))
      val after = next.join(touched, Seq("id"), "left_semi")
      summary = Ops.updateChecksum(summary, before, after, "id", rowStr, buckets = 8)
      state = next
      // the incrementally-maintained summary equals the from-scratch
      // one at EVERY step, including zero-count bucket drop-out
      assert(rows(summary) == rows(full(state)),
        "incremental summary diverged from the full recompute")
    }
    // group identity: removing and re-adding the same rows is a no-op
    val idemp = Ops.updateChecksum(summary, state, state, "id", rowStr, buckets = 8)
    assert(rows(idemp) == rows(summary), "before == after must be an identity update")
    // deletes must decrement: a tombstone for every key empties the
    // summary entirely (no zero-count buckets survive)
    val wipe = Ops.updateChecksum(summary, state,
      state.limit(0), "id", rowStr, buckets = 8)
    assert(rows(wipe).isEmpty, "removing all rows must empty the summary")
  }
}
