package graft.tools

import org.apache.spark.sql.functions._

/** Dev probe: print dHash cell means (exact bits) + bands for given
  * doc ids — the engine side of the mm_dedup float-parity diagnosis.
  * Run: sbt "runMain graft.tools.DHashProbe <sfdir> <docId,docId,...>"
  */
object DHashProbe {
  def main(args: Array[String]): Unit = {
    val s = graft.Engine.session("graft-dhashprobe")
    val ids = args(1).split(",").map(_.toLong).toSet
    import s.implicits._
    val docs = graft.Tables(s, args(0)).documents
      .filter(col("doc_id").isin(ids.toSeq: _*))
    val media = graft.llm.Multimodal.encodeImages(docs).collect()
    media.foreach { r =>
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.payload))
      val cells = graft.llm.Multimodal.dHashCellsForProbe(img)
      println(s"[dhash] doc=${r.doc_id} type=${img.getType} w=${img.getWidth} h=${img.getHeight}")
      cells.zipWithIndex.foreach { case (c, i) =>
        println(f"[dhash] doc=${r.doc_id} cell=$i%2d mean=$c%.17g bits=${java.lang.Double.doubleToLongBits(c)}%016x")
      }
      // first raster row via BOTH read paths — the getRGB-vs-getSample
      // divergence this probe exists to expose
      val viaRgb = (0 until math.min(8, img.getWidth))
        .map(x => img.getRGB(x, 0) & 0xff).mkString(",")
      val viaSample = (0 until math.min(8, img.getWidth))
        .map(x => img.getRaster.getSample(x, 0, 0)).mkString(",")
      println(s"[dhash] doc=${r.doc_id} row0_getRGB=$viaRgb row0_getSample=$viaSample")
    }
    s.stop()
  }
}
