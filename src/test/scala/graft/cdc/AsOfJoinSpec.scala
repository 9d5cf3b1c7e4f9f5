package graft.cdc

import graft.SparkSpec

/** Edge semantics of the union+window-fold as-of join. */
class AsOfJoinSpec extends SparkSpec {

  private def asof(
      lefts: Seq[(Long, Long, Long)],          // (lid, key, ts)
      rights: Seq[(Long, Long, Option[String])] // (key, ts, payload v)
  ) = {
    val s = spark
    import s.implicits._
    val l = lefts.toDF("lid", "k", "t")
    val r = rights.toDF("k2", "t2", "v")
    Ops
      .asOfJoin(l, r, leftKey = "k", rightKey = "k2", leftTs = "t", rightTs = "t2",
        rightPayload = Seq("t2", "v"))
      .collect()
      .map(x => (x.getAs[Long]("lid"), x.getAs[Long]("t2"), Option(x.getAs[String]("v"))))
      .toSet
  }

  test("picks the latest right row at-or-before the left timestamp") {
    val res = asof(
      lefts = Seq((1L, 7L, 50L), (2L, 7L, 10L), (3L, 7L, 20L)),
      rights = Seq((7L, 20L, Some("a")), (7L, 40L, Some("b")), (7L, 60L, Some("c"))))
    // left row at ts=10 has no earlier right row → dropped (inner)
    assert(res == Set((1L, 40L, Some("b")), (3L, 20L, Some("a"))))
    // left row exactly at a right ts includes it (<= semantics)
    assert(res.contains((3L, 20L, Some("a"))))
  }

  test("null payload FIELDS don't leak values from older right rows") {
    val res = asof(
      lefts = Seq((1L, 7L, 100L)),
      rights = Seq((7L, 10L, Some("old")), (7L, 50L, None)))
    // latest right row (ts=50) has v=null; the fill must NOT substitute
    // "old" from the ts=10 row
    assert(res == Set((1L, 50L, None)))
  }

  test("keys never seen on the right produce no output") {
    val res = asof(
      lefts = Seq((1L, 1L, 100L)),
      rights = Seq((2L, 10L, Some("x"))))
    assert(res.isEmpty)
  }

  test("randomized: union+window and native merge-scan both equal brute force") {
    val s = spark
    import s.implicits._
    // fixed-seed random histories: duplicate timestamps, sparse keys,
    // left rows before/after/between right versions — the shapes the
    // hand-written cases can't enumerate
    val rng = new scala.util.Random(20260812L)
    for (trial <- 1 to 3) {
      val lefts = (1 to 120).map(i =>
        (i.toLong, rng.nextInt(9).toLong, rng.nextInt(40).toLong))
      val rights = (1 to 80).map(i =>
        (rng.nextInt(9).toLong, rng.nextInt(40).toLong, i.toLong))
      val l = lefts.toDF("lid", "k", "t")
      val r = rights.toDF("k2", "t2", "rv")
      // brute force: per left row, max-(t2, rv) right row with t2 <= t
      val want = lefts.flatMap { case (lid, k, t) =>
        val cands = rights.filter(rr => rr._1 == k && rr._2 <= t)
        if (cands.isEmpty) None
        else {
          val best = cands.maxBy(rr => (rr._2, rr._3))
          Some((lid, best._2, best._3))
        }
      }.toSet
      val viaWindow = Ops
        .asOfJoin(l, r, "k", "k2", "t", "t2",
          rightPayload = Seq("t2", "rv"), rightOrd = Seq("rv"))
        .collect().map(x => (x.getAs[Long]("lid"), x.getAs[Long]("t2"), x.getAs[Long]("rv")))
        .toSet
      assert(viaWindow == want, s"trial $trial: union+window diverged from brute force")
      val viaNative = graft.plans.AsOfJoinPlan
        .asOf(l, r, "k", "k2", "t", "t2",
          rightPayload = Seq("t2", "rv"), rightTieBreak = Seq("rv"))
        .collect().map(x => (x.getAs[Long]("lid"), x.getAs[Long]("t2"), x.getAs[Long]("rv")))
        .toSet
      assert(viaNative == want, s"trial $trial: native merge-scan diverged from brute force")
    }
  }

  test("join_asof_tol: left semantics with a live staleness bound; matched age within tolerance") {
    val s = spark
    val dir = sf("sf0.001")
    val rows = graft.SparkEntry.queries("join_asof_tol")(s, dir).collect()
      .map(r => (r.getAs[Long]("scn"),
        Option(r.getAs[java.lang.Long]("o_orderkey")),
        Option(r.getAs[java.lang.Long]("age_ms"))))
    val feedN = graft.SparkEntry.queries("cdc_scan")(s, dir).count()
    // LEFT semantics: every feed row survives exactly once
    assert(rows.length.toLong == feedN, s"${rows.length} vs feed $feedN")
    assert(rows.map(_._1).distinct.length == rows.length, "scn must stay unique")
    val tolMs = 9000L * 86400000L
    rows.foreach { case (scn, ok, age) =>
      assert(ok.isDefined == age.isDefined, s"scn $scn: payload/age must null together")
      age.foreach(a => assert(a >= 0L && a <= tolMs, s"scn $scn age $a out of bound"))
    }
    // the bound must be LIVE on the fixture: both regimes present
    assert(rows.exists(_._2.isDefined), "no in-tolerance match on the fixture")
    assert(rows.exists(_._2.isEmpty), "tolerance never bit on the fixture")
    // consistency with the unbounded as-of: every tol-match equals the
    // plain as-of match for that scn (the bound only ever REMOVES)
    val plain = graft.SparkEntry.queries("join_asof")(s, dir).collect()
      .map(r => r.getAs[Long]("scn") -> r.getAs[Long]("o_orderkey")).toMap
    rows.foreach { case (scn, ok, _) =>
      ok.foreach(k => assert(plain.get(scn).contains(k),
        s"scn $scn: tol match $k differs from plain as-of ${plain.get(scn)}"))
    }
  }
}
