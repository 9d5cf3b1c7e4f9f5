package graft.tools

import org.apache.spark.sql.functions._
import graft.cdc.{ChangeFeed, Ops, Stream}
import graft.Tables

/** Dev probe: per-stage timing of the snapshot_while_streaming and
  * stream_apply_verify ids — spool write, streaming fold (with batch
  * count from the query progress), state read — so the optimization
  * targets the stage that actually costs (guide §1).
  *
  * Usage: sbt "runMain graft.tools.SwsProfile <sfDir> [reps]"
  */
object SwsProfile {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 2
    val s = graft.Engine.session("graft-swsprofile")
    val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    s.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val desc = Option(j.properties.getProperty("spark.job.description")).getOrElse("")
        jobStart.put(j.jobId, (System.nanoTime(), desc))
      }
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        Option(jobStart.remove(j.jobId)).foreach { case (t0, desc) =>
          println(f"[sws]   job ${j.jobId}%3d ${(System.nanoTime() - t0) / 1e9}%7.3f s  $desc")
        }
      }
    })
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[sws] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    for (rep <- 1 to reps) {
      println(s"[sws] ===== snapshot_while_streaming rep $rep =====")
      val base = Ops.snapshot(
        Tables(s, dir).customer.select(
          col("c_custkey").as("id"),
          lit(null).cast("timestamp").as("ts"),
          lit("snapshot").as("event_type"),
          col("c_acctbal").as("value"),
          col("c_name").as("props")),
        scn = 0L).withColumn("scn", col("scn").cast("long"))
      val feed = ChangeFeed.fromEvents(s, dir)
      val cols = Seq("id", "scn", "op", "ts", "event_type", "value", "props")
      val reads = Ops.chunkReadEvents(base, feed,
        keyCol = "id", scnCol = "scn", opCol = "op", nChunks = 8)
      val work = graft.Engine.scratchDir("graft-swsprof")
      val in = work.resolve("in").toString
      t("write feed spool") {
        feed.select(cols.map(col): _*).write.mode("append").parquet(in)
      }
      t("write reads spool") {
        reads.select(cols.map(col): _*).repartition(1).write.mode("append").parquet(in)
      }
      val nFiles = new java.io.File(in).listFiles().count(_.getName.endsWith(".parquet"))
      println(s"[sws] spool files: $nFiles")
      val wire = s.readStream
        .schema(feed.select(cols.map(col): _*).schema)
        .option("maxFilesPerTrigger", 32)
        .parquet(in)
        .withColumn("__rank", when(col("op") === "r", 0L).otherwise(lit(1L)))
      val statePath = work.resolve("state").toString
      val q = t("streaming fold") {
        val q0 = Stream.materialize(wire, Seq("id"), ordering = Seq("scn", "__rank"),
          statePath, work.resolve("chk").toString)
        q0.awaitTermination()
        q0
      }
      println(s"[sws] batches: ${q.recentProgress.length} " +
        q.recentProgress.map(p => f"${p.batchDuration}ms(${p.numInputRows})").mkString(", "))
      q.recentProgress.foreach(p => println(s"[sws] durationMs: ${p.durationMs}"))
      t("state read + noop") {
        Stream.readCurrentState(s, statePath)
          .select("id", "ts", "event_type", "value", "props")
          .orderBy("id")
          .write.format("noop").mode("overwrite").save()
      }
      val stateFiles = {
        def walk(f: java.io.File): Seq[java.io.File] =
          if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
        walk(new java.io.File(statePath)).count(_.getName.endsWith(".parquet"))
      }
      println(s"[sws] state files: $stateFiles")
    }
    s.stop()
  }
}
