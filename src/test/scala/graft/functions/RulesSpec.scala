package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** SimplifySelfCosine optimizer rule: folds self-similarity to a null
  * check, leaves distinct-argument calls untouched, and the rewritten
  * plan evaluates to the same values the unrewritten one would.
  */
class RulesSpec extends SparkSpec {

  private def hasCosine(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Boolean =
    plan.expressions.exists(_.exists(_.isInstanceOf[CosineSimilarity])) ||
      plan.children.exists(hasCosine)

  test("self-cosine folds to constant; distinct args survive; values preserved") {
    val s = spark
    CosineSimilarity.ensureRegistered(s)
    // parquet-backed, NOT Seq.toDF: the optimizer eagerly evaluates
    // projections over a LocalRelation, which would bypass the rule
    val emb = graft.Tables(s, sf("sf0.001")).embeddings.filter(col("vec_id") < 2)
    // nullable self-argument: null for odd vec_ids
    val a = org.apache.spark.sql.functions
      .when(org.apache.spark.sql.functions.pmod(col("vec_id"), org.apache.spark.sql.functions.lit(2)) === 0,
        col("embedding"))
    val q = emb.select(
      col("vec_id"),
      CosineSimilarity.cosine_sim(a, a).as("self_c"),
      CosineSimilarity.cosine_sim(a, org.apache.spark.sql.functions.reverse(col("embedding"))).as("cross_c"))
    val before = q.queryExecution.optimizedPlan
    val after = SimplifySelfCosine(before)
    // the self call is gone, the cross call remains
    assert(hasCosine(before))
    assert(hasCosine(after), "cross-argument cosine must survive the rule")
    val selfGone = !after.expressions.exists(_.exists {
      case CosineSimilarity(x, y) => x.semanticEquals(y)
      case _                      => false
    })
    assert(selfGone, s"self-cosine not folded:\n$after")
    // evaluate the rewritten plan: non-null → 1.0, null → null
    val rows = org.apache.spark.sql.GraftBridge.ofRows(s, after)
      .orderBy("vec_id").collect()
    assert(rows(0).getDouble(1) == 1.0 && !rows(0).isNullAt(2))
    assert(rows(1).isNullAt(1) && rows(1).isNullAt(2))
  }

  test("rule wired into a live session folds self-cosine during optimization") {
    // same hook GraftExtensions uses at session-build time
    // (injectOptimizerRule), exercised here through the public
    // session-level registration so the shared test session can be used
    val s = spark
    CosineSimilarity.ensureRegistered(s)
    s.experimental.extraOptimizations = Seq(SimplifySelfCosine)
    try {
      val emb = graft.Tables(s, sf("sf0.001")).embeddings.filter(col("vec_id") < 4)
      val q = emb.select(
        CosineSimilarity.cosine_sim(col("embedding"), col("embedding")).as("c"))
      assert(!hasCosine(q.queryExecution.optimizedPlan),
        q.queryExecution.optimizedPlan.toString)
      assert(q.collect().forall(_.getDouble(0) == 1.0))
    } finally s.experimental.extraOptimizations = Nil
  }
}
