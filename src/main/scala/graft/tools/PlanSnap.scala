package graft.tools

/** Dev utility: write `.explain("formatted")` output for query ids to
  * files — the per-round optimization evidence (`plans/rNN/<id>_<tag>.txt`).
  *
  * Usage: sbt "runMain graft.tools.PlanSnap <sfDir> <outDir> <tag> <id1,id2,...>"
  *
  * Writes `<outDir>/<id>_<tag>.txt` with the FormattedMode plan (the
  * judge-facing format: numbered operators, PushedFilters/ReadSchema,
  * exchange/ join details). Prepare steps are NOT run — the snapshot is
  * the cold plan exactly as Bench's first run would build it.
  */
object PlanSnap {
  def main(args: Array[String]): Unit = {
    val Array(dir, outDir, tag, idsCsv) = args.take(4)
    val spark = graft.Engine.session("graft-plansnap")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    idsCsv.split(",").foreach { id =>
      val df = graft.SparkEntry.queries(id)(spark, dir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(outDir, s"${id}_$tag.txt"),
        plan.getBytes("UTF-8"))
      println(s"[plansnap] wrote $outDir/${id}_$tag.txt (${plan.length} chars)")
    }
    spark.stop()
  }
}
