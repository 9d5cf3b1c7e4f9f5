package graft.tools

import org.apache.spark.sql.functions._

/** Dev probe: is the distributed BPE loop's PER-ITERATION cost
  * vocab-scale or corpus-scale? (round-9 verdict ask #7)
  *
  * Usage: sbt "runMain graft.tools.BpeProbe <sfDir> <copies> [kLo] [kHi]"
  *
  * Builds an UNSALTED in-memory replica (`copies`× the documents table
  * with shifted doc_ids, texts verbatim) so the corpus grows `copies`×
  * while the VOCABULARY stays constant — the separation the salted
  * ScaleUp replicas can't show (there vocab grows with the corpus).
  * Forces the fully-distributed path (maxLocalVocab = 0) and times
  * train at kLo and kHi merges; per-iteration cost = (T(kHi) − T(kLo))
  * / (kHi − kLo), and the remainder ≈ the one corpus-scale word-count
  * collapse + fixed overhead. Vocab-scale iterations ⇒ per-iteration
  * stays ~flat as copies grows; the collapse alone scales with the
  * corpus.
  */
object BpeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val copies = args(1).toInt
    val kLo = if (args.length > 2) args(2).toInt else 2
    val kHi = if (args.length > 3) args(3).toInt else 10
    val spark = graft.Engine.session("graft-bpe-probe")
    try {
      val docs = graft.Engine.table(spark, sfDir, "documents")
      val replica = (0 until copies)
        .map(i => docs.withColumn("doc_id", col("doc_id") + lit(i * 100000000L)))
        .reduce(_ unionByName _)
      def time(k: Int): Double = {
        val t0 = System.nanoTime()
        val m = graft.llm.Bpe.train(replica, k, maxLocalVocab = 0)
        require(m.size == k, s"expected $k merges, got ${m.size}")
        (System.nanoTime() - t0) / 1e9
      }
      time(kLo) // untimed warmup of the whole path
      val tLo = time(kLo)
      val tHi = time(kHi)
      val perIter = (tHi - tLo) / (kHi - kLo)
      val collapse = tLo - kLo * perIter
      println(f"[bpe-probe] copies=$copies%-3d corpus=${docs.count() * copies}%-8d " +
        f"t($kLo)=$tLo%.2f t($kHi)=$tHi%.2f per_iter=$perIter%.3f s " +
        f"collapse+fixed=$collapse%.2f s " +
        f"paths(local=${graft.llm.Bpe.localPathCount.get()},dist=${graft.llm.Bpe.distPathCount.get()})")
    } finally spark.stop()
  }
}
