package graft.tools

import graft.{Engine, Tables}
import graft.llm.NearDedup
import org.apache.spark.sql.functions._

/** Dev scratch: stage-by-stage timing of dedup_jaccard at sf0.1. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session("scratch")
    val dir = "/root/testdata/sf0.1"
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val arrs = NearDedup.shingleArrays(Tables(spark, dir).documents)
    time("warm")(arrs.write.format("noop").mode("overwrite").save())
    time("arrs")(arrs.write.format("noop").mode("overwrite").save())
    val ex = arrs.select(col("doc_id"), explode(col("sh")).as("shingle"))
    time("explode")(ex.write.format("noop").mode("overwrite").save())
    def commonWith(h: String) = {
      val rhs = ex.select(col("doc_id").as("doc2"), col("shingle"))
      val r2 = if (h.isEmpty) rhs else rhs.hint(h)
      ex.select(col("doc_id").as("doc1"), col("shingle"))
        .join(r2, "shingle")
        .filter(col("doc1") < col("doc2"))
        .groupBy("doc1", "doc2")
        .agg(count(lit(1)).as("com"))
    }
    time("ex count")(println("  n=" + ex.count()))
    // explode of the plain word split (no transform/distinct)
    val exWords = graft.Engine.spread(Tables(spark, dir).documents, "doc_id")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
    time("explode words a")(exWords.write.format("noop").mode("overwrite").save())
    time("explode words b")(exWords.write.format("noop").mode("overwrite").save())
    // zip_with formulation: split evaluated 3x per row, not per element
    val ws = split(col("text"), " ")
    val sh2 = array_distinct(
      zip_with(
        zip_with(ws, slice(ws, lit(2), size(ws)), (a, b) => concat(a, lit(" "), b)),
        slice(ws, lit(3), size(ws)),
        (ab, c) => concat(ab, lit(" "), c)))
    val arrs2 = graft.Engine.spread(Tables(spark, dir).documents, "doc_id")
      .filter(size(ws) >= 3).select(col("doc_id"), sh2.as("sh"))
    val ex2 = arrs2.select(col("doc_id"), explode(col("sh")).as("shingle"))
    time("zipwith arrs")(arrs2.write.format("noop").mode("overwrite").save())
    time("zipwith explode a")(ex2.write.format("noop").mode("overwrite").save())
    time("zipwith explode b")(ex2.write.format("noop").mode("overwrite").save())
    time("zipwith explode count")(println("  n2=" + ex2.count()))
    spark.stop()
  }
}
