package graft

import org.apache.spark.sql.functions.col

/** Streaming-path throughput bench: drive the sf dir's full `events`
  * change feed through `Stream.materialize` (file channel, AvailableNow,
  * several micro-batches) and report events/sec end-to-end — source scan,
  * envelope fold, bucketed state rewrite, checkpoint commits included.
  *
  * Prints ONE JSON line (and writes it to stream_bench_out.json) so the
  * driver/BASELINE.md get a regression guard for the CDC streaming path
  * itself, which the per-query Bench (batch plans only) doesn't cover.
  *
  * Feed generation (events → JSON change files) is SETUP and untimed;
  * the timer covers only the streaming query start→drain.
  */
object StreamBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // Scale-slope knob: replicate the feed N× with DISJOINT key spaces
    // (ScaleUp keeps `events` fixed like a dim, so the streaming path
    // needs its own replication). Each copy keeps its original scns —
    // per-key ordering is what the channel contract guarantees, and
    // every key lives in exactly one copy — so N× multiplies keys AND
    // events without changing any per-key history.
    val copies = sys.env.getOrElse("SPARK_GRAFT_STREAM_COPIES", "1").toInt
    val spark = Engine.session("graft-stream-bench")
    val feed1 = cdc.ChangeFeed.fromEvents(spark, sfDir)
    val keyShift = 1000000000L
    val feedDf =
      if (copies == 1) feed1
      else {
        // the disjoint-key-space invariant is only real if every source
        // id fits under the shift — otherwise copies silently overlap,
        // merging unrelated per-key histories with duplicate scns (and
        // the state self-check below can't see it, because `expect` is
        // computed from the same corrupted feed)
        // max of an empty feed is SQL NULL — surface that as a clear
        // diagnostic instead of an NPE out of getLong
        val maxIdBoxed = feed1.agg(org.apache.spark.sql.functions.max(col("id")))
          .head.getAs[java.lang.Long](0)
        require(maxIdBoxed != null,
          s"change feed from $sfDir is empty — nothing to replicate into $copies copies")
        val maxId = maxIdBoxed.longValue
        require(maxId < keyShift,
          s"feed ids up to $maxId overflow the $keyShift copy shift — raise keyShift")
        (0 until copies).map(i =>
          feed1.withColumn("id", col("id") + org.apache.spark.sql.functions.lit(i * keyShift)))
          .reduce(_ unionByName _)
      }
    val n = feedDf.count()
    val work = java.nio.file.Files.createTempDirectory("graft-stream-bench")
    val feedDir = work.resolve("feed").toString
    // 20 files × maxFilesPerTrigger=4 → 5 micro-batches: exercises the
    // incremental bucketed-state path, not one giant batch. The channel
    // must be ordered ACROSS batches per key (the Kafka key→partition
    // contract the sinks assume; a delete is dropped from state, so a
    // staler cross-batch redelivery would resurrect the key): range-
    // partition by scn so file-name order IS scn order, then give files
    // distinct ascending mtimes — the file source orders same-mtime
    // files nondeterministically.
    feedDf.repartitionByRange(20, col("scn")).write.mode("overwrite").json(feedDir)
    val files = new java.io.File(feedDir).listFiles()
      .filter(_.getName.endsWith(".json")).sortBy(_.getName)
    val base = System.currentTimeMillis() - files.length * 1000L
    files.zipWithIndex.foreach { case (f, i) => f.setLastModified(base + i * 1000L) }
    val stream = spark.readStream
      .schema(feedDf.schema)
      .option("maxFilesPerTrigger", 4)
      .json(feedDir)
    val t0 = System.nanoTime()
    val q = cdc.Stream.materialize(
      stream,
      keys = Seq("id"),
      ordering = Seq("scn"),
      statePath = work.resolve("state").toString,
      checkpointDir = work.resolve("chk").toString)
    q.awaitTermination()
    val elapsed = (System.nanoTime() - t0) / 1e9
    val stateRows = cdc.Stream.readCurrentState(spark, work.resolve("state").toString).count()
    // sanity: the materialized state must be the batch fold of the feed
    val expect = cdc.Ops.applyChanges(feedDf, Seq("id"), Seq("scn")).count()
    require(stateRows == expect, s"state rows $stateRows != batch fold $expect")
    val eps = n / elapsed
    val json =
      s"""{"metric":"stream_materialize_eps","value":$eps,"unit":"events/sec","events":$n,"copies":$copies,""" +
        s""""elapsed_sec":$elapsed,"state_rows":$stateRows,"sf":"$sfDir"}"""
    java.nio.file.Files.write(java.nio.file.Paths.get("stream_bench_out.json"),
      (json + "\n").getBytes("UTF-8"))
    println(json)
    spark.stop()
    // clean the working dir (full serialized feed + state + checkpoint —
    // repeated rounds would otherwise accumulate gigabytes in /tmp)
    def rm(p: java.nio.file.Path): Unit = {
      if (java.nio.file.Files.isDirectory(p)) {
        val st = java.nio.file.Files.list(p)
        try st.forEach(rm(_)) finally st.close()
      }
      java.nio.file.Files.deleteIfExists(p)
    }
    rm(work)
  }
}
