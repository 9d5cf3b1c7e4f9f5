package graft.tools

import org.apache.spark.sql.functions._
import graft.llm.NearDedup

/** Dev utility: stage-level A/B of the dedup_simhash_pairs pipeline —
  * times (a) the 64-bit simhash projection alone, (b) the blocked/conv
  * table, (c) candidates over it, (d) the full new pipeline, to find
  * which stage regressed. Throwaway diagnosis harness.
  */
object SimhashAB {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = graft.Engine.session("graft-simhash-ab")
    def time(label: String)(f: => Unit): Unit = {
      System.gc()
      val t0 = System.nanoTime()
      f
      println(f"[ab] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val docs = graft.Tables(spark, dir).documents
    val arrs = NearDedup.shingleArrays(docs).persist()
    arrs.count() // warm the shingle table outside every timer
    for (round <- 1 to 2) {
      println(s"--- round $round")
      time("simhash64 alone") {
        NearDedup.simhash(arrs, bits = 64)
          .write.format("noop").mode("overwrite").save()
      }
      val sigs = NearDedup.simhash(arrs, bits = 64)
      val blocks = sigs.select(
        col("doc_id") +:
          (0 until 4).map(b =>
            conv(substring(col("sim_sig"), 1 + 16 * b, 16), 2, 10)
              .cast("long").as(s"band_$b")): _*)
      time("blocks (conv) alone") {
        blocks.write.format("noop").mode("overwrite").save()
      }
      time("candidates(blocks)") {
        NearDedup.candidates(blocks)
          .write.format("noop").mode("overwrite").save()
      }
      val blocksStr = sigs.select(
        col("doc_id") +:
          (0 until 4).map(b =>
            substring(col("sim_sig"), 1 + 16 * b, 16).as(s"band_$b")): _*)
      time("candidates(blocksStr)") {
        NearDedup.candidates(blocksStr)
          .write.format("noop").mode("overwrite").save()
      }
      time("full new pipeline") {
        val ham = (0 until 4)
          .map(b => bit_count(col(s"a_$b").bitwiseXOR(col(s"b_$b"))))
          .reduce(_ + _)
        NearDedup.candidates(blocks)
          .join(blocks.select(col("doc_id").as("doc1") +:
            (0 until 4).map(b => col(s"band_$b").as(s"a_$b")): _*), "doc1")
          .join(blocks.select(col("doc_id").as("doc2") +:
            (0 until 4).map(b => col(s"band_$b").as(s"b_$b")): _*), "doc2")
          .withColumn("hamming", ham.cast("long"))
          .filter(col("hamming") <= 3)
          .write.format("noop").mode("overwrite").save()
      }
      time("full hybrid pipeline") {
        val ham = (0 until 4)
          .map(b => bit_count(col(s"a_$b").bitwiseXOR(col(s"b_$b"))))
          .reduce(_ + _)
        def sideOf(alias: String, prefix: String) = sigs.select(
          col("doc_id").as(alias) +:
            (0 until 4).map(b =>
              conv(substring(col("sim_sig"), 1 + 16 * b, 16), 2, 10)
                .cast("long").as(s"$prefix$b")): _*)
        NearDedup.candidates(blocksStr)
          .join(sideOf("doc1", "a_"), "doc1")
          .join(sideOf("doc2", "b_"), "doc2")
          .withColumn("hamming", ham.cast("long"))
          .filter(col("hamming") <= 3)
          .write.format("noop").mode("overwrite").save()
      }
      time("full old pipeline") {
        val hamOld = aggregate(
          transform(sequence(lit(1), lit(64)), i =>
            when(col("s1").substr(i.cast("int"), lit(1)) =!=
                 col("s2").substr(i.cast("int"), lit(1)), 1L)
              .otherwise(0L)),
          lit(0L), (acc, x) => acc + x)
        NearDedup.candidates(blocksStr)
          .join(sigs.select(col("doc_id").as("doc1"), col("sim_sig").as("s1")), "doc1")
          .join(sigs.select(col("doc_id").as("doc2"), col("sim_sig").as("s2")), "doc2")
          .withColumn("hamming", hamOld)
          .filter(col("hamming") <= 3)
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
