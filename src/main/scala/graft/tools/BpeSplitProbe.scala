package graft.tools

import org.apache.spark.sql.functions._

/** Dev probe (r18 optimization): where does bpe_encode's time go —
  * the vocab-side applyMerges fold, or the corpus-scale
  * join/collect/md5 tail? Times each subplan with the noop sink.
  *
  * Usage: sbt "runMain graft.tools.BpeSplitProbe <sfDir> [runs]"
  */
object BpeSplitProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val runs = if (args.length > 1) args(1).toInt else 3
    val s = graft.Engine.session("graft-bpesplit")
    val docs = graft.Tables(s, dir).documents
    val merges = graft.llm.Bpe.trainedMerges(s, dir)

    val spreadDocs = graft.Engine.spread(docs.select("doc_id", "text"), "doc_id")
    def words = spreadDocs
      .select(col("doc_id"),
        posexplode(filter(split(col("text"), " "), w => length(w) > 0))
          .as(Seq("pos", "w")))
    def vocabPlain = words.select("w").distinct()
    def vocabFold = vocabPlain
      .select(col("w"), graft.llm.Bpe.applyMerges(
        concat(split(col("w"), ""), array(lit("</w>"))), merges).as("toks"))

    def time(tag: String, mk: () => org.apache.spark.sql.DataFrame): Unit = {
      val ts = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        mk().write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[bpesplit] $tag%-22s median=${ts.sorted.apply(runs / 2)}%.3f s  runs=${ts.map(t => f"$t%.3f").mkString(",")}")
    }

    time("words", () => words)
    time("vocab_distinct", () => vocabPlain)
    time("vocab_fold", () => vocabFold)
    time("full_encode", () => graft.llm.Bpe.encodeDocs(docs.select("doc_id", "text"), merges))
    println("[bpesplit] vocab rows = " + vocabPlain.count())
    s.stop()
  }
}
