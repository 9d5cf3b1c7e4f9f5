package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe: isolate where `text_repetition_full`'s time goes at 25×
  * by timing structural variants of the same plan (usage:
  * `runMain graft.tools.RepProbe <sfDir> [runs]`):
  *
  *   - `full`    — the production id (md5-56 gram hash, two-level agg)
  *   - `xxh`     — same shape, xxhash64 gram key (isolates md5 cost)
  *   - `nogram`  — explode + count only, no gram string built at all
  *                 (isolates the concat_ws string-construction cost)
  *   - `noexpl`  — scan + split + size only (the floor: parquet + split)
  */
object RepProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val runs = if (args.length > 1) args(1).toInt else 3
    val spark = graft.Engine.session("graft-repprobe")
    try {
      val docs = graft.Tables(spark, sfDir).documents

      def ngr(n: Int): Column = {
        val grams = transform(sequence(lit(1), size(col("ws")) - (n - 1)),
          i => concat_ws(" ", (0 until n).map(o => element_at(col("ws"), i + o)): _*))
        when(size(col("ws")) >= n, grams).otherwise(array())
      }
      val tagged = (tag: Int, arr: Column) =>
        transform(arr, x => struct(lit(tag).as("tag"), x.as("g")))
      val entries = concat((2 to 10).map(n => tagged(n, ngr(n))): _*)
      val base = docs
        .select(col("doc_id"), length(col("text")).as("n_chars"),
          split(col("text"), " ").as("ws"))

      def agg2(keyed: DataFrame): DataFrame = keyed
        .groupBy("doc_id", "tag", "gh")
        .agg(count(lit(1)).as("cnt"), max(col("glen")).as("glen"))
        .groupBy("doc_id", "tag")
        .agg(sum(col("cnt")).as("total"), count(lit(1)).as("n_distinct"),
          max(col("cnt") * col("glen")).as("top_chars"))

      val variants: Seq[(String, () => DataFrame)] = Seq(
        "full" -> (() => agg2(base
          .select(col("doc_id"), explode(entries).as("e"))
          .select(col("doc_id"), col("e.tag").as("tag"),
            conv(substring(md5(col("e.g")), 1, 14), 16, 10).cast("long").as("gh"),
            length(col("e.g")).as("glen")))),
        "xxh" -> (() => agg2(base
          .select(col("doc_id"), explode(entries).as("e"))
          .select(col("doc_id"), col("e.tag").as("tag"),
            xxhash64(col("e.g")).as("gh"), length(col("e.g")).as("glen")))),
        "nogram" -> (() => base
          .select(col("doc_id"), explode(entries).as("e"))
          .groupBy(col("doc_id"), col("e.tag")).agg(count(lit(1)).as("total"))),
        "noexpl" -> (() => base
          .groupBy("doc_id").agg(max(size(col("ws"))).as("n"))),
        // rolling 56-bit polynomial over per-word md5 hashes — gram
        // strings never built; glen from a word-length array
        "wordhash" -> (() => {
          val M = 1L << 56
          val wh = base
            .withColumn("hws", transform(col("ws"),
              w => conv(substring(md5(w), 1, 14), 16, 10).cast("long")))
            .withColumn("lws", transform(col("ws"), w => length(w)))
          val gramTag = (n: Int) => {
            val gh = (i: Column) => (0 until n).map(o => element_at(col("hws"), i + o))
              .reduce((acc, h) => (acc * 31 + h) % M)
            val gl = (i: Column) => (0 until n).map(o => element_at(col("lws"), i + o))
              .reduce(_ + _) + lit(n - 1)
            val arr = transform(sequence(lit(1), size(col("ws")) - (n - 1)),
              i => struct(lit(n).as("tag"), gh(i).as("gh"), gl(i).cast("long").as("glen")))
            when(size(col("ws")) >= n, arr).otherwise(array())
          }
          val ent = concat((2 to 10).map(gramTag): _*)
          wh.select(col("doc_id"), explode(ent).as("e"))
            .select(col("doc_id"), col("e.tag").as("tag"), col("e.gh").as("gh"),
              col("e.glen").as("glen"))
            .groupBy("doc_id", "tag", "gh")
            .agg(count(lit(1)).as("cnt"), max(col("glen")).as("glen"))
            .groupBy("doc_id", "tag")
            .agg(sum(col("cnt")).as("total"), count(lit(1)).as("n_distinct"),
              max(col("cnt") * col("glen")).as("top_chars"))
        }),
        // fully in-row: pack (gh48, glen16) into one long per gram,
        // array_sort, run-length fold via aggregate() — no explode, no
        // shuffle; 13 signals computed per document row
        "inrow" -> (() => {
          val M = 1L << 47
          val wh = base
            .withColumn("hws", transform(col("ws"),
              w => conv(substring(md5(w), 1, 11), 16, 10).cast("long")))
            .withColumn("lws", transform(col("ws"), w => length(w)))
          def packed(n: Int): Column = {
            val gh = (i: Column) => (0 until n).map(o => element_at(col("hws"), i + o))
              .reduce((acc, h) => (acc * 31 + h) % M)
            val gl = (i: Column) => least(
              (0 until n).map(o => element_at(col("lws"), i + o)).reduce(_ + _)
                + lit(n - 1), lit(65535)).cast("long")
            val arr = transform(sequence(lit(1), size(col("ws")) - (n - 1)),
              i => gh(i) * 65536L + gl(i))
            when(size(col("ws")) >= n, arr).otherwise(array().cast("array<long>"))
          }
          def sigsOf(n: Int): Column = {
            val sorted = array_sort(packed(n))
            val init = struct(lit(-1L).as("prev"), lit(0L).as("cnt"),
              lit(0L).as("glen"), lit(0L).as("nd"), lit(0L).as("top"), lit(0L).as("dup"))
            def close(acc: Column) = struct(
              lit(0L).as("prev"), lit(0L).as("cnt"), lit(0L).as("glen"),
              (acc.getField("nd") + when(acc.getField("cnt") > 0, 1L).otherwise(0L)).as("nd"),
              greatest(acc.getField("top"),
                acc.getField("cnt") * acc.getField("glen")).as("top"),
              (acc.getField("dup") + when(acc.getField("cnt") >= 2,
                acc.getField("cnt") * acc.getField("glen")).otherwise(0L)).as("dup"))
            val folded = aggregate(sorted, init,
              (acc, x) => {
                val gh = shiftrightunsigned(x, 16)
                val gl = x.bitwiseAND(lit(65535L))
                when(gh === acc.getField("prev"),
                  struct(acc.getField("prev").as("prev"),
                    (acc.getField("cnt") + 1L).as("cnt"), gl.as("glen"),
                    acc.getField("nd").as("nd"), acc.getField("top").as("top"),
                    acc.getField("dup").as("dup")))
                .otherwise({
                  val c = close(acc)
                  struct(gh.as("prev"), lit(1L).as("cnt"), gl.as("glen"),
                    c.getField("nd").as("nd"), c.getField("top").as("top"),
                    c.getField("dup").as("dup"))
                })
              },
              acc => close(acc))
            struct(size(sorted).cast("long").as("total"),
              folded.getField("nd").as("n_distinct"),
              folded.getField("top").as("top_chars"),
              folded.getField("dup").as("dup_chars"))
          }
          wh.select(col("doc_id") +:
            (2 to 10).map(n => sigsOf(n).as(s"t$n")): _*)
        })
      )
      variants.foreach { case (name, mk) =>
        val times = (1 to runs).map { _ =>
          System.gc()
          val t0 = System.nanoTime()
          mk().write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
        val med = times.sorted.apply(times.size / 2)
        println(f"[repprobe] $name%-8s median=$med%.3f s  runs=${times.map(t => f"$t%.3f").mkString(",")}")
      }
    } finally spark.stop()
  }
}
