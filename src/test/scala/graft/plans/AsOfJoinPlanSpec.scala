package graft.plans

import graft.SparkSpec
import graft.cdc.Ops
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** The custom merge-scan as-of operator must agree with the composed
  * union+window implementation on random inputs, and its plan must show
  * the custom exec node.
  */
class AsOfJoinPlanSpec extends SparkSpec {

  private def run(lefts: Seq[(Long, Long, Long)], rights: Seq[(Long, Long, Long, String)]) = {
    val s = spark
    import s.implicits._
    val l = lefts.toDF("lid", "k", "t")
    val r = rights.toDF("k2", "t2", "ord", "v")
    val native = AsOfJoinPlan
      .asOf(l, r, "k", "k2", "t", "t2", rightPayload = Seq("ord", "v"),
        rightTieBreak = Seq("ord"))
      .collect()
      .map(x => (x.getAs[Long]("lid"), x.getAs[Long]("ord"), x.getAs[String]("v")))
      .toSet
    val composed = Ops
      .asOfJoin(l, r, "k", "k2", "t", "t2",
        rightPayload = Seq("ord", "v"), rightOrd = Seq("t2", "ord"))
      .collect()
      .map(x => (x.getAs[Long]("lid"), x.getAs[Long]("ord"), x.getAs[String]("v")))
      .toSet
    (native, composed)
  }

  test("native as-of equals the composed window formulation on random data") {
    val gen = for {
      nl <- Gen.chooseNum(0, 60)
      nr <- Gen.chooseNum(0, 60)
      ls <- Gen.listOfN(nl, for {
        k <- Gen.chooseNum(0L, 5L); t <- Gen.chooseNum(0L, 50L)
      } yield (k, t))
      rs <- Gen.listOfN(nr, for {
        k <- Gen.chooseNum(0L, 5L); t <- Gen.chooseNum(0L, 50L)
      } yield (k, t))
    } yield (ls, rs)
    (1 to 12).foreach { seed =>
      val (ls, rs) = gen.apply(Gen.Parameters.default, Seed(seed.toLong)).get
      val lefts = ls.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
      val rights = rs.zipWithIndex.map { case ((k, t), i) =>
        (k, t, i.toLong, s"r$i")
      }
      val (native, composed) = run(lefts, rights)
      assert(native == composed, s"seed=$seed lefts=$lefts rights=$rights")
    }
  }

  test("shared-lineage as-of join returns the RIGHT payload, not the left row's own values") {
    val s = spark
    import s.implicits._
    // right = a filtered view of the SAME DataFrame — without the fresh
    // right-side aliasing the duplicated exprIds would bind the payload
    // to the left positions and silently echo the left row's own column
    val df = Seq(
      (1L, 7L, 10L, "early"),
      (2L, 7L, 20L, "mid"),
      (3L, 7L, 30L, "late")).toDF("rid", "k", "t", "v")
    val out = graft.plans.AsOfJoinPlan
      .asOf(df, df.filter($"t" < 25), "k", "k", "t", "t", rightPayload = Seq("v"))
      .collect()
      .map(r => r.getAs[Long]("rid") -> r.getString(4)) // index 4 = right v
      .toMap
    // rid=3 (t=30, own v="late") must get the matched right payload "mid"
    assert(out == Map(1L -> "early", 2L -> "mid", 3L -> "mid"), out.toString)
  }

  test("the custom exec node appears in the physical plan") {
    val s = spark
    import s.implicits._
    val l = Seq((1L, 1L, 10L)).toDF("lid", "k", "t")
    val r = Seq((1L, 5L, 0L, "x")).toDF("k2", "t2", "ord", "v")
    val df = AsOfJoinPlan.asOf(l, r, "k", "k2", "t", "t2", Seq("v"))
    assert(df.queryExecution.executedPlan.toString.contains("AsOfJoin"))
    assert(df.collect().map(_.getAs[String]("v")).toSeq == Seq("x"))
  }
}
