package graft.tools

/** Dev probe (r18): multimodal codec parallelism — cached-corpus
  * partition count and isolated encode/decode timings.
  *
  * Usage: sbt "runMain graft.tools.MmProbe <sfDir> [runs]"
  */
object MmProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val runs = if (args.length > 1) args(1).toInt else 3
    val s = graft.Engine.session("graft-mmprobe")
    val docs = graft.Tables(s, dir).documents
    println("[mmprobe] docs = " + docs.count())

    def time(tag: String, mk: () => org.apache.spark.sql.DataFrame): Unit = {
      val ts = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        mk().write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[mmprobe] $tag%-16s median=${ts.sorted.apply(runs / 2)}%.3f s  runs=${ts.map(t => f"$t%.3f").mkString(",")}")
    }

    val media = graft.llm.Multimodal.encodeImages(docs)
    println("[mmprobe] encode partitions = " + media.rdd.getNumPartitions)
    val cached = media.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    cached.count()
    time("decode_cached", () => graft.llm.Multimodal.decodeImages(cached).toDF())
    time("resize_cached", () => graft.llm.Multimodal.resizeImages(cached).toDF())
    time("encode_fresh", () => graft.llm.Multimodal.encodeImages(docs).toDF())
    val audio = graft.llm.Multimodal.encodeAudio(docs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    audio.count()
    time("audio_cache_scan", () => audio.toDF())
    time("audio_decode", () => graft.llm.Multimodal.decodeAudio(audio).toDF())
    time("audio_encode", () => graft.llm.Multimodal.encodeAudio(docs).toDF())
    s.stop()
  }
}
