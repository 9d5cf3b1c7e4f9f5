package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Count-Min sketch aggregator (SURVEY.md §2.11 typed-UDAF surface;
  * Cormode & Muthukrishnan 2005): a fixed `depth × width` counter grid;
  * each key increments one counter per row (indexed by an independent
  * hash per row of the grid), and a point estimate is the MIN of a key's
  * `depth` counters — an overestimate by at most ε·N (ε = e/width) with
  * probability ≥ 1 − δ (δ = e^−depth), never an underestimate.
  *
  * Why this exists at 100 TB: exact heavy-hitter detection needs a full
  * `groupBy(key)` — a shuffle of every distinct key — while the sketch
  * is a CONSTANT-size (depth·width longs, ~32 KB here) fully mergeable
  * buffer: every map task folds its partition locally and the shuffle
  * carries one grid per partial, not per-key rows. That mergeability is
  * exactly the `Aggregator.merge` contract (cell-wise add — Count-Min is
  * a linear sketch), so Spark's standard partial-aggregation machinery
  * gives the scale path for free. The same grid also answers OTHER keys'
  * frequencies after the fact — a groupBy result can't.
  *
  * Determinism: hash = the ENGINE-PORTABLE 56-bit md5 idiom over
  * "row:key" (the [[graft.llm.Sampling.hashBucket]] contract, round 15
  * — previously a splitmix64 finalizer, which DuckDB cannot replay:
  * BIGINT arithmetic there errors on overflow instead of wrapping, so
  * the grid was rows-only forever; md5 is mirrored verbatim by every
  * oracle in the repo and costs ~10× splitmix per row, which a 4-row
  * probe of a scan-rate sketch absorbs — the 25× slope stays linear).
  * Identical estimates on every run and partitioning (addition
  * commutes). No randomness anywhere.
  */
object CountMin {

  val Depth = 4
  val Width = 1024

  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** 56-bit md5 of "row:key" mod width — the portable-hash cell index
    * (DuckDB mirror: `CAST('0x' || substring(md5(row || ':' || key),
    * 1, 14) AS BIGINT) % width`).
    */
  private def cell(row: Int, key: Long): Int = {
    val d = md.get()
    d.reset()
    val h = d.digest(s"$row:$key".getBytes("UTF-8"))
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (h(i) & 0xffL); i += 1 }
    (v % Width).toInt
  }

  /** Point-estimate from a finished grid (row-major Array of
    * Depth·Width counts): min over the key's Depth counters.
    */
  def estimate(grid: Array[Long], key: Long): Long = {
    var best = Long.MaxValue
    var r = 0
    while (r < Depth) {
      val c = grid(r * Width + cell(r, key))
      if (c < best) best = c
      r += 1
    }
    best
  }

  /** Long-key Count-Min: aggregates a key column into the flat grid.
    * Null keys are skipped (like built-in counting aggs over null).
    */
  val countMinLong: Aggregator[java.lang.Long, Array[Long], Array[Long]] =
    new Aggregator[java.lang.Long, Array[Long], Array[Long]] {
      override def zero: Array[Long] = new Array[Long](Depth * Width)
      override def reduce(b: Array[Long], a: java.lang.Long): Array[Long] = {
        if (a != null) {
          var r = 0
          while (r < Depth) { b(r * Width + cell(r, a.longValue)) += 1L; r += 1 }
        }
        b
      }
      override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
        // linear sketch: cell-wise addition IS the merge
        var i = 0
        while (i < b1.length) { b1(i) += b2(i); i += 1 }
        b1
      }
      override def finish(r: Array[Long]): Array[Long] = r
      override def bufferEncoder: Encoder[Array[Long]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
      override def outputEncoder: Encoder[Array[Long]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    }

  /** Column-API form: count_min(key) → array<long> grid. */
  val count_min: org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(countMinLong)
}
