package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev utility: build an N× scale-up of a fixture dir for slope probes.
  *
  * Usage: sbt "runMain graft.tools.ScaleUp <srcDir> <dstDir> <copies>"
  *
  * Fact-like tables (documents, embeddings, lineitem, orders) are
  * replicated `copies`× with shifted keys; dimension tables are copied
  * verbatim (at the 100 TB design point facts grow, dims don't — so a
  * slope probe should scale exactly what real growth scales).
  *
  * Replication must not CHANGE each query's asymptotic shape, only its
  * n — two traps avoided here:
  *  - documents: verbatim copies would make every doc a near-dup of its
  *    clones (candidate pairs quadratic in `copies`). Each copy salts
  *    every WORD with the copy index instead: shingle counts, doc
  *    lengths, and per-shingle document frequencies are all preserved
  *    per copy, so LSH/Jaccard cost scales linearly like a real corpus.
  *  - embeddings: identical vectors would all-collide in sign-LSH
  *    buckets. Each copy gets a deterministic per-copy rotation of the
  *    array (same norm, same dimension, decorrelated buckets).
  */
object ScaleUp {

  def main(args: Array[String]): Unit = {
    val Array(src, dst, copiesStr) = args.take(3)
    val copies = copiesStr.toInt
    require(copies >= 1, s"copies must be >= 1, got $copies")
    val spark = graft.Engine.session("graft-scaleup")
    val dims = Seq("region", "nation", "customer", "supplier", "part", "events")
    dims.foreach { t =>
      graft.Engine.table(spark, src, t)
        .write.mode("overwrite").parquet(s"$dst/$t.parquet")
    }
    scaled(spark, src, copies).foreach { case (t, df) =>
      // spread across tasks so the scaled files aren't one giant
      // row-group (the single-row-group trap TESTDATA fixtures have)
      df.repartition(spark.sparkContext.defaultParallelism)
        .write.mode("overwrite").parquet(s"$dst/$t.parquet")
    }
    println(s"[scaleup] wrote ${copies}x of $src to $dst")
    spark.stop()
  }

  private def scaled(spark: SparkSession, src: String, copies: Int): Seq[(String, DataFrame)] = {
    def table(t: String) = graft.Engine.table(spark, src, t)
    def replicate(df: DataFrame, transform: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until copies).map(i => transform(df, i)).reduce(_ unionByName _)

    val keyShift = 100000000L // far above any fixture key

    val docs = replicate(table("documents"), { (df, i) =>
      val d = df.withColumn("doc_id", col("doc_id") + lit(i * keyShift))
      if (i == 0) d
      else d.withColumn("text",
        array_join(transform(split(col("text"), " "),
          w => concat(w, lit(s"_$i"))), " "))
    })

    val emb = replicate(table("embeddings"), { (df, i) =>
      val d = df.withColumn("vec_id", col("vec_id") + lit(i * keyShift))
      if (i == 0) d
      // rotate the float array by i positions: concat(tail, head)
      else d.withColumn("embedding",
        concat(slice(col("embedding"), i + 1, 100000),
          slice(col("embedding"), 1, i)))
    })

    val orders = replicate(table("orders"), { (df, i) =>
      df.withColumn("o_orderkey", col("o_orderkey") + lit(i * keyShift))
    })

    val lineitem = replicate(table("lineitem"), { (df, i) =>
      df.withColumn("l_orderkey", col("l_orderkey") + lit(i * keyShift))
    })

    Seq("documents" -> docs, "embeddings" -> emb,
      "orders" -> orders, "lineitem" -> lineitem)
  }
}
