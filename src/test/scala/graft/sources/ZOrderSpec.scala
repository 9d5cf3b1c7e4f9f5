package graft.sources

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Z-order clustering: the Morton interleave must match an independent
  * in-JVM reference, and the LAYOUT must deliver what it exists for —
  * tight per-file min/max ranges on BOTH dimensions (parquet footer
  * pruning prunes on footers, so the audit reads per-file extents, not
  * result rows; result correctness is the oracle differential's job).
  */
class ZOrderSpec extends SparkSpec {

  private def mortonRef(a: Int, b: Int): Long = {
    def spread(x: Long): Long = {
      var v = x
      v = (v | (v << 8)) & 0x00FF00FF00FF00FFL
      v = (v | (v << 4)) & 0x0F0F0F0F0F0F0F0FL
      v = (v | (v << 2)) & 0x3333333333333333L
      v = (v | (v << 1)) & 0x5555555555555555L
      v
    }
    spread(a.toLong) | (spread(b.toLong) << 1)
  }

  test("zval matches the in-JVM Morton reference and is monotone per dimension") {
    val s = spark
    import s.implicits._
    val pairs = for (a <- 0 to 40; b <- 0 to 12) yield (a, b)
    val got = pairs.toDF("a", "b")
      .select(col("a"), col("b"), ZOrder.zval(col("a"), col("b")).as("z"))
      .as[(Int, Int, Long)].collect()
    got.foreach { case (a, b, z) =>
      assert(z == mortonRef(a, b), s"($a,$b)")
    }
    // monotone in each dimension with the other held fixed — the only
    // property range-pruning needs from the curve
    val byB = got.groupBy(_._2)
    byB.values.foreach { rows =>
      val sorted = rows.sortBy(_._1)
      sorted.sliding(2).foreach {
        case Array(x, y) => assert(x._3 < y._3, s"non-monotone in a at $x -> $y")
        case _ =>
      }
    }
  }

  test("z-layout gives tight per-file extents on BOTH dims; a single-column sort covers the full second dim") {
    val s = spark
    val dir = sf("sf0.001")
    val li = Tables(s, dir).lineitem
    val base = java.nio.file.Files.createTempDirectory("zorder").toString
    ZOrder.writeZOrdered(li, s"$base/z", "l_partkey", "l_suppkey")
    li.repartitionByRange(16, col("l_partkey")).sortWithinPartitions("l_partkey")
      .write.parquet(s"$base/s")
    // per-file (min,max) of both dims — exactly what parquet footers
    // expose to the scan's pruning
    def extents(path: String): Array[(Long, Long, Long, Long)] =
      s.read.parquet(path)
        .groupBy(input_file_name())
        .agg(min("l_partkey").as("p0"), max("l_partkey").as("p1"),
          min("l_suppkey").as("s0"), max("l_suppkey").as("s1"))
        .collect().map(r => (r.getAs[Long]("p0"), r.getAs[Long]("p1"),
          r.getAs[Long]("s0"), r.getAs[Long]("s1")))
    val z = extents(s"$base/z")
    val sorted = extents(s"$base/s")
    assert(z.length > 4 && sorted.length > 4, "need a multi-file layout to audit")
    // predicate rectangles ~25-30% per dim (the fixture's key domains
    // are partkey 0..199, suppkey 0..9)
    def fracStraddling(ex: Array[(Long, Long, Long, Long)],
        dim: String, lo: Long, hi: Long): Double = {
      val n = ex.count { case (p0, p1, s0, s1) =>
        if (dim == "p") p0 <= hi && p1 >= lo else s0 <= hi && s1 >= lo
      }
      n.toDouble / ex.length
    }
    // the single-column sort: perfect on its own column, USELESS on the
    // second — every file spans the full suppkey domain
    assert(fracStraddling(sorted, "p", 0, 49) <= 0.5,
      "partkey sort must prune partkey predicates")
    assert(fracStraddling(sorted, "s", 0, 2) == 1.0,
      "a partkey sort cannot prune suppkey predicates")
    // the z-layout: prunes on BOTH dims, and strictly beats the sort on
    // the second dimension
    val zP = fracStraddling(z, "p", 0, 49)
    val zS = fracStraddling(z, "s", 0, 2)
    assert(zP < 1.0 && zS < 1.0, s"z-layout must prune both dims: p=$zP s=$zS")
    assert(zS < fracStraddling(sorted, "s", 0, 2),
      "z-layout must beat the single-column sort on the second dimension")
    assert(zP <= 0.75 && zS <= 0.75,
      s"z-layout extents too loose to be useful: p=$zP s=$zS")
  }
}
