package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Count-Min sketch: the one-sided error guarantee under Spark's real
  * partial-aggregation path (many partitions → many merges), linearity,
  * and null-skip.
  */
class CountMinSpec extends SparkSpec {

  test("never underestimates, overestimate bounded, stable across partitionings") {
    val s = spark
    import s.implicits._
    // zipf-ish: key k appears ~ 3000/k times — heavy hitters + long tail
    val rows = (1L to 60L).flatMap(k => Seq.fill((3000 / k).toInt)(k))
    val exact = rows.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val n = rows.size.toLong
    // the tight ⌈e·N/width⌉ bound is probabilistic (p ≈ 1 − e⁻ᴰᵉᵖᵗʰ per
    // key) over the CHOICE of hash functions — but the sketch's hashes
    // are fixed constants, so on this pinned fixture the assertion is
    // deterministic: it either holds for every key forever or never did.
    // Query-side (`agg_heavyhitters.within_bound`) the bound is widened
    // 4× so arbitrary data can't flip it; see Queries.scala.
    val bound = math.ceil(n * 2.718281828 / CountMin.Width).toLong
    for (parts <- Seq(1, 8, 32)) {
      val grid = rows.toDF("k").repartition(parts)
        .agg(CountMin.count_min(col("k")))
        .head.getSeq[Long](0).toArray
      assert(grid.length == CountMin.Depth * CountMin.Width)
      exact.foreach { case (k, c) =>
        val e = CountMin.estimate(grid, k)
        assert(e >= c, s"underestimate for key $k: $e < $c (parts=$parts)")
        assert(e <= c + bound, s"estimate for key $k blew the e·N/width bound: $e > $c + $bound")
      }
      // grid total per depth-row is exactly N (every row increments one
      // cell per grid row) — the linearity invariant merges must preserve
      (0 until CountMin.Depth).foreach { r =>
        val rowSum = grid.slice(r * CountMin.Width, (r + 1) * CountMin.Width).sum
        assert(rowSum == n, s"depth row $r sums to $rowSum, expected $n (parts=$parts)")
      }
    }
  }

  test("linear sketch: grid of a union equals cell-wise sum of the parts' grids") {
    val s = spark
    import s.implicits._
    def gridOf(ks: Seq[Long]) =
      ks.toDF("k").agg(CountMin.count_min(col("k"))).head.getSeq[Long](0).toArray
    val a = Seq(1L, 2L, 2L, 3L)
    val b = Seq(2L, 3L, 3L, 9L)
    val whole = gridOf(a ++ b)
    val summed = gridOf(a).zip(gridOf(b)).map { case (x, y) => x + y }
    assert(whole.sameElements(summed))
  }

  test("null keys are skipped, like built-in counting aggs") {
    val s = spark
    import s.implicits._
    val grid = Seq[java.lang.Long](1L, null, 1L, null)
      .toDF("k").agg(CountMin.count_min(col("k"))).head.getSeq[Long](0).toArray
    assert(CountMin.estimate(grid, 1L) == 2L)
    assert(grid.sum == CountMin.Depth * 2L, "only the 2 non-null rows may count")
  }

  test("streaming grid equals the batch grid exactly (linear sketch as streaming state)") {
    // the merge-is-addition property means a micro-batched streaming
    // aggregation must land on the IDENTICAL grid the one-shot batch agg
    // produces — no approximation drift from batching. This is what
    // makes the sketch usable as bounded streaming state: a global
    // streaming agg carries one constant-size buffer, while an exact
    // streaming groupBy(key) state grows with key cardinality forever.
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("cm-stream")
    val rows = (1L to 40L).flatMap(k => Seq.fill((200 / k).toInt)(k))
    rows.grouped(150).zipWithIndex.foreach { case (g, i) =>
      val p = dir.resolve(s"part-$i.json")
      java.nio.file.Files.write(p,
        g.map(k => s"""{"k":$k}""").mkString("\n").getBytes)
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k",
        org.apache.spark.sql.types.LongType)))
    val q = s.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).json(dir.toString)
      .agg(CountMin.count_min(col("k")).as("grid"))
      .writeStream.format("memory").queryName("cm_grid")
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val streamed = s.table("cm_grid").head.getSeq[Long](0).toArray
    val batch = rows.toDF("k").agg(CountMin.count_min(col("k")))
      .head.getSeq[Long](0).toArray
    assert(streamed.sameElements(batch),
      "micro-batched fold diverged from the one-shot grid")
  }

  test("agg_heavyhitters: top-10 by exact count, estimates in bound") {
    val s = spark
    val got = graft.SparkEntry.queries("agg_heavyhitters")(s, sf("sf0.001")).collect()
    assert(got.length == 10)
    assert(got.map(_.getAs[Long]("rank")).toSeq == (1L to 10L))
    // ranks descend by exact count
    val counts = got.map(_.getAs[Long]("exact_n")).toSeq
    assert(counts == counts.sortBy(-_))
    assert(got.forall(_.getAs[Boolean]("within_bound")), "CM guarantee violated on the fixture")
  }
}
