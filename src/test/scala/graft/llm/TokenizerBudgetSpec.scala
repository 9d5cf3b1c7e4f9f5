package graft.llm

import graft.SparkSpec

/** Contract of the cross-family vocab-budget sweep (round 18): the
  * half-budget subsets genuinely shrink each model, the char closure
  * keeps every corpus word segmentable at both budgets, and BPE's
  * token total is monotone in the merge count (a merge prefix can only
  * leave MORE tokens — the one family where monotonicity is a theorem,
  * not an empirical tendency; greedy/Viterbi families are reported,
  * not asserted).
  */
class TokenizerBudgetSpec extends SparkSpec {

  test("budget sweep: half models shrink, closure holds, BPE monotone") {
    val rows = graft.SparkEntry.queries("tokenizer_budget")(spark, sf("sf0.001"))
      .collect()
    assert(rows.length == 6, s"expected 6 arms, got ${rows.length}")
    val m = rows.map(r => (r.getString(0), r.getString(1)) -> r).toMap
    for (f <- Seq("bpe", "wordpiece", "unigram")) {
      assert(m((f, "half")).getLong(2) < m((f, "full")).getLong(2),
        s"$f half model must be strictly smaller")
      assert(m((f, "half")).getLong(4) == 0L && m((f, "full")).getLong(4) == 0L,
        s"$f char closure must keep coverage total on the training corpus")
      assert(m((f, "half")).getLong(5) == m((f, "full")).getLong(5),
        "total_words is corpus property, budget-independent")
    }
    assert(m(("bpe", "half")).getLong(3) >= m(("bpe", "full")).getLong(3),
      "BPE total tokens must be monotone non-increasing in merges")
  }
}
