package graft.llm

/** Independent in-JVM reimplementation of [[TextOps.qualityE6Rational]]
  * for spec cross-checks (round 16): the quality composite ships as
  * exact BIGINT rational micro-units, so the specs that re-derive
  * selection orders must use the same integer arithmetic — re-deriving
  * through the float composite would re-introduce exactly the ulp
  * boundary the rational form exists to remove.
  *
  * Mirrors Spark semantics deliberately: split(" ") with limit -1
  * (Spark's split keeps trailing empties), length = chars, stopword
  * set {the, a, of, and}.
  */
object ExactQualityKit {
  private val stopSet = Set("the", "a", "of", "and")

  /** (n_words, stop_count, symbol_chars, text_length) */
  def counts(text: String): (Long, Long, Long, Long) = {
    val parts = text.split(" ", -1)
    (parts.length.toLong,
      parts.count(stopSet).toLong,
      text.replaceAll("[a-z ]", "").length.toLong,
      text.length.toLong)
  }

  private def rational(text: String): Option[(Long, Long, Long)] = {
    val (w, stop, sym, len) = counts(text)
    if (len == 0L) None
    else {
      val den = w * len
      val num = den * (5000L * math.min(100L, w) + 200000L) +
        300000L * stop * len - 200000L * sym * w
      Some((w, num, den))
    }
  }

  /** round(q·1e6) via the exact half-up identity (2n+d) div (2d). */
  def qualityE6(text: String): Option[Long] =
    rational(text).map { case (_, num, den) => (2L * num + den) / (2L * den) }

  /** round(q/w·1e9) = (2000n + d·w) div (2·d·w), exact — with the
    * round-18 overflow guard: for den = w·len ≥ 2·10⁹ the key re-bases
    * on the rounded quality_e6 (density = half-up(q_e6·1000/w)),
    * mirroring [[TextOps.densityE9Expr]] and both density oracles.
    * Scala Long `/` truncates toward zero exactly like Spark DIV.
    */
  def densityE9(text: String): Option[Long] =
    rational(text).map { case (w, num, den) =>
      if (den < 2000000000L) (2000L * num + den * w) / (2L * den * w)
      else {
        val q = (2L * num + den) / (2L * den)
        (q * 2000L + w) / (2L * w)
      }
    }
}
