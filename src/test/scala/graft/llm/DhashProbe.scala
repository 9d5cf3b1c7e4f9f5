package graft.llm

// scratch diagnostic — delete before commit
object DhashProbe {
  def png(w: Int, h: Int, cycles: Double, phase: Double): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    for (y <- 0 until h; x <- 0 until w)
      raster.setSample(x, y, 0,
        (128 + 120 * math.sin(2 * math.Pi * (cycles * x / w + phase))).toInt.max(0).min(255))
    img
  }
  def resize(img: java.awt.image.BufferedImage, num: Int, den: Int): java.awt.image.BufferedImage = {
    val (w, h) = (img.getWidth, img.getHeight)
    val (ow, oh) = (math.max(1, w * num / den), math.max(1, h * num / den))
    val out = new java.awt.image.BufferedImage(ow, oh, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until oh; x <- 0 until ow)
      out.getRaster.setSample(x, y, 0, img.getRGB(x * w / ow, y * h / oh) & 0xff)
    out
  }
  def main(args: Array[String]): Unit = {
    val specs = Seq((36, 30, 1.0, 0.0), (33, 27, 2.0, 0.25), (30, 36, 3.0, 0.5), (27, 33, 1.5, 0.75))
    val hs = specs.map { case (w, h, c, p) => Multimodal.dHash64(png(w, h, c, p)) }
    val rs = specs.map { case (w, h, c, p) => Multimodal.dHash64(resize(png(w, h, c, p), 2, 3)) }
    for (i <- specs.indices) {
      println(s"img $i: orig=${hs(i).toHexString} resized=${rs(i).toHexString} " +
        s"dist=${java.lang.Long.bitCount(hs(i) ^ rs(i))}")
    }
    for (i <- specs.indices; j <- specs.indices if i < j)
      println(s"cross $i-$j dist=${java.lang.Long.bitCount(hs(i) ^ hs(j))}")
  }
}
