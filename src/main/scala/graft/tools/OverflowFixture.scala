package graft.tools

import org.apache.spark.sql.functions._

/** Dev fixture builder (round 18, VERDICT task 2): copies a source
  * fixture dir and plants one ~1 MB document (w·len ≈ 2.6·10¹¹ — past
  * the density_e9 exact form's 2·10⁹ contract bound, inside
  * quality_e6's 4.6·10¹² bound) into documents.parquet, so the
  * select_budget_density(_approx) differential can prove the
  * overflow-guarded key is IDENTICAL in both engines on an
  * out-of-contract corpus (check.py runs the same guarded oracle SQL
  * in DuckDB). Usage: runMain graft.tools.OverflowFixture <dst> <srcSfDir>
  */
object OverflowFixture {
  def main(args: Array[String]): Unit = {
    val Array(dst, src) = args.take(2)
    val spark = graft.Engine.session("graft-overflow-fixture")
    import spark.implicits._
    val giant = Array.fill(32000)("the be to of and that have with " +
      "lorem ipsum dolor sit amet consectetur adipiscing elit").mkString(" ")
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "embeddings")
    tables.foreach { t =>
      graft.Engine.table(spark, src, t)
        .write.mode("overwrite").parquet(s"$dst/$t.parquet")
    }
    val docs = graft.Engine.table(spark, src, "documents")
    val big = Seq((999999999L, "planted", giant)).toDF("doc_id", "source", "text")
    docs.select("doc_id", "source", "text").unionByName(big)
      .write.mode("overwrite").parquet(s"$dst/documents.parquet")
    println(s"[ovfix] wrote $src + 1 planted ~${giant.length / 1000} KB doc to $dst")
    spark.stop()
  }
}
