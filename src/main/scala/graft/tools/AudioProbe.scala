package graft.tools

/** Dev probe (r18): isolate javax.sound per-call cost — header parse
  * via AudioSystem SPI scan vs direct stream reuse. No Spark.
  */
object AudioProbe {
  def main(args: Array[String]): Unit = {
    val n = 256 + 512
    val data = Array.tabulate[Byte](n)(i => (i % 251).toByte)
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 8, 1, false, false)
    val ais0 = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, n.toLong)
    val baos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais0,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
    val wav = baos.toByteArray
    def loop(rounds: Int): Double = {
      val t0 = System.nanoTime()
      var i = 0
      while (i < rounds) {
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(wav))
        val pcm = ais.readAllBytes()
        assert(pcm.length == n)
        i += 1
      }
      (System.nanoTime() - t0) / 1e6 / rounds
    }
    loop(500) // warm-up
    println(f"[audioprobe] per-decode = ${loop(5000)}%.4f ms")
    // encode side
    def encLoop(rounds: Int): Double = {
      val t0 = System.nanoTime()
      var i = 0
      while (i < rounds) {
        val a = new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(data), fmt, n.toLong)
        val b = new java.io.ByteArrayOutputStream()
        javax.sound.sampled.AudioSystem.write(a,
          javax.sound.sampled.AudioFileFormat.Type.WAVE, b)
        i += 1
      }
      (System.nanoTime() - t0) / 1e6 / rounds
    }
    encLoop(500)
    println(f"[audioprobe] per-encode = ${encLoop(5000)}%.4f ms")
    // SPI reader list + probe-order cost
    import scala.jdk.CollectionConverters._
    val readers = java.util.ServiceLoader
      .load(classOf[javax.sound.sampled.spi.AudioFileReader]).asScala.toList
    println("[audioprobe] readers = " + readers.map(_.getClass.getSimpleName).mkString(","))
    def probeLoop(rounds: Int): Double = {
      val t0 = System.nanoTime()
      var i = 0
      while (i < rounds) {
        var ais: javax.sound.sampled.AudioInputStream = null
        val it2 = readers.iterator
        while (ais == null && it2.hasNext) {
          try ais = it2.next().getAudioInputStream(new java.io.ByteArrayInputStream(wav))
          catch { case _: javax.sound.sampled.UnsupportedAudioFileException => () }
        }
        val pcm = ais.readAllBytes()
        var sum = 0L; var peak = 0; var j = 0
        while (j < pcm.length) {
          val v = pcm(j) & 0xff
          sum += math.abs(v - 128); if (v > peak) peak = v; j += 1
        }
        val _ = graft.llm.Multimodal.queries // force object init, no-op
        i += 1
      }
      (System.nanoTime() - t0) / 1e6 / rounds
    }
    probeLoop(500)
    println(f"[audioprobe] per-probe-decode = ${probeLoop(5000)}%.4f ms")
  }
}
