package graft.tools

import org.apache.spark.sql.DataFrame
import graft.Tables
import graft.llm.VectorOps

/** Dev probe: IVF-PQ recall / fidelity at small SF, to ground the
  * SimilaritySpec bounds in measured numbers (the pqTopK probe habit).
  *
  * Usage: sbt "runMain graft.tools.IvfPqProbe <sfDir>"
  */
object IvfPqProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = graft.Engine.session("graft-ivfpq-probe")
    try {
      val emb = Tables(spark, dir).embeddings
      val k = 10
      val qids = 0L until 8L
      val truth = VectorOps.simTopK(emb, qids, k).collect()
        .groupBy(_.getAs[Long]("q_id"))
        .map { case (q, rs) => q -> rs.map(_.getAs[Long]("c_id")).toSet }
      def recallOf(df: DataFrame): Double = {
        val got = df.collect().groupBy(_.getAs[Long]("q_id"))
          .map { case (q, rs) => q -> rs.map(_.getAs[Long]("c_id")).toSet }
        qids.map { q =>
          got.get(q).map(a => (a intersect truth(q)).size.toDouble / k).getOrElse(0.0)
        }.sum / qids.size
      }
      val idx = VectorOps.ivfPqIndex(spark, dir, cells = 16, m = 8, ks = 16)
      val pq = VectorOps.pqIndex(spark, dir, m = 8, ks = 16)
      println(f"[ivfpq] pureADC nprobe=4  recall = ${recallOf(
        VectorOps.ivfPqTopK(emb, qids, k, nprobe = 4, rerank = 1, index = Some(idx)))}%.3f")
      println(f"[ivfpq] pureADC nprobe=16 recall = ${recallOf(
        VectorOps.ivfPqTopK(emb, qids, k, nprobe = 16, rerank = 1, index = Some(idx)))}%.3f")
      println(f"[ivfpq] rerank  nprobe=4  recall = ${recallOf(
        VectorOps.ivfPqTopK(emb, qids, k, nprobe = 4, rerank = 4, index = Some(idx)))}%.3f")
      println(f"[ivfpq] rerank  nprobe=16 recall = ${recallOf(
        VectorOps.ivfPqTopK(emb, qids, k, nprobe = 16, rerank = 4, index = Some(idx)))}%.3f")
      println(f"[ivfpq] pq pureADC        recall = ${recallOf(
        VectorOps.pqTopK(emb, qids, k, rerank = 1, index = Some(pq)))}%.3f")
      println(f"[ivfpq] pq rerank         recall = ${recallOf(
        VectorOps.pqTopK(emb, qids, k, rerank = 4, index = Some(pq)))}%.3f")
      // fidelity: mean cos(u, recon) for residual-PQ vs raw-PQ, in-JVM
      val model = idx.model
      val books = pq.books
      val sub = model.books(0)(0).length
      val vecs = emb.select("vec_id", "embedding").collect()
        .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
      def unit(v: Array[Float]): Array[Double] = {
        val n = math.sqrt(v.map(x => x.toDouble * x).sum)
        v.map(_.toDouble / n)
      }
      def nearest(v: Array[Double], cs: Array[Array[Double]]): Int = {
        var best = 0; var bd = Double.MaxValue
        cs.indices.foreach { c =>
          var d = 0.0; var i = 0
          while (i < v.length) { val t = v(i) - cs(c)(i); d += t * t; i += 1 }
          if (d < bd) { bd = d; best = c }
        }
        best
      }
      def cosTo(u: Array[Double], r: Array[Double]): Double = {
        val dot = u.zip(r).map { case (a, b) => a * b }.sum
        dot / math.sqrt(r.map(x => x * x).sum)
      }
      val (ivfpqF, rawF) = vecs.values.map { v =>
        val u = unit(v)
        val cell = nearest(u, model.coarse)
        val cc = model.coarse(cell)
        val res = u.indices.map(i => u(i) - cc(i)).toArray
        val recon1: Array[Double] = Array.tabulate(u.length) { i =>
          val j = i / sub
          cc(i) + model.books(j)(nearest(
            java.util.Arrays.copyOfRange(res, j * sub, (j + 1) * sub),
            model.books(j)))(i % sub)
        }
        val recon2: Array[Double] = Array.tabulate(u.length) { i =>
          val j = i / sub
          books(j)(nearest(
            java.util.Arrays.copyOfRange(u, j * sub, (j + 1) * sub),
            books(j)))(i % sub)
        }
        (cosTo(u, recon1), cosTo(u, recon2))
      }.unzip
      println(f"[ivfpq] mean recon_cos residual-PQ = ${ivfpqF.sum / ivfpqF.size}%.4f " +
        f"min = ${ivfpqF.min}%.4f  vs raw-PQ mean = ${rawF.sum / rawF.size}%.4f")
    } finally spark.stop()
  }
}
