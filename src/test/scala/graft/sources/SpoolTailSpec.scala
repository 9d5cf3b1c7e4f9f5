package graft.sources

import graft.SparkSpec

/** The directory-tailing half of the spool sources (SURVEY.md §2.1: the
  * reference's spooldir connector watches a drop directory): `json_scan`
  * proves the batch parse is lossless; this proves the STREAMING claim —
  * files appended after the stream starts are picked up, nothing is
  * double-read, and the typed schema applies to every file.
  */
class SpoolTailSpec extends SparkSpec {

  test("jsonl spool tail: late-arriving files are ingested exactly once with the declared schema") {
    val s = spark
    val dir = java.nio.file.Files.createTempDirectory("jsonl_tail")
    dir.toFile.deleteOnExit()
    def drop(name: String, rows: Seq[String]): Unit = {
      // write-then-rename: the atomic drop pattern a real spool uses so
      // the tailer never reads a half-written file
      val tmp = dir.resolve(s".$name.tmp")
      java.nio.file.Files.write(tmp, rows.mkString("\n").getBytes("UTF-8"))
      java.nio.file.Files.move(tmp, dir.resolve(name),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }
    drop("batch0.jsonl", Seq(
      """{"s_suppkey":1,"s_name":"a","s_nationkey":10,"s_acctbal":1.5}""",
      """{"s_suppkey":2,"s_name":"b","s_nationkey":11,"s_acctbal":2.5}"""))
    val q = s.readStream.schema(JsonSpool.supplierSchema).json(dir.toString)
      .writeStream.format("memory").queryName("jsonl_tail_q")
      .start()
    try {
      q.processAllAvailable()
      val after1 = s.sql("SELECT * FROM jsonl_tail_q").collect()
      assert(after1.length == 2, s"first drop must land: ${after1.length}")
      // a file arriving AFTER the stream started
      drop("batch1.jsonl", Seq(
        """{"s_suppkey":3,"s_name":"c","s_nationkey":12,"s_acctbal":-3.25}"""))
      q.processAllAvailable()
      val rows = s.sql("SELECT s_suppkey, s_name, s_nationkey, s_acctbal FROM jsonl_tail_q")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getDouble(3)))
        .sortBy(_._1)
      assert(rows.toSeq == Seq((1L, "a", 10, 1.5), (2L, "b", 11, 2.5), (3L, "c", 12, -3.25)),
        s"late file must be ingested exactly once, typed: ${rows.toSeq}")
    } finally q.stop()
  }

  test("csv spool tail: the spooldir claim holds for the CSV reader too") {
    val s = spark
    val dir = java.nio.file.Files.createTempDirectory("csv_tail")
    dir.toFile.deleteOnExit()
    java.nio.file.Files.write(dir.resolve("n0.csv"),
      "n_nationkey,n_name,n_regionkey\n0,ALGERIA,0\n1,ARGENTINA,1".getBytes("UTF-8"))
    val q = s.readStream.schema(CsvSpool.nationSchema)
      .option("header", "true").csv(dir.toString)
      .writeStream.format("memory").queryName("csv_tail_q")
      .start()
    try {
      q.processAllAvailable()
      java.nio.file.Files.write(dir.resolve("n1.csv"),
        "n_nationkey,n_name,n_regionkey\n2,BRAZIL,1".getBytes("UTF-8"))
      q.processAllAvailable()
      val rows = s.sql("SELECT n_nationkey, n_name, n_regionkey FROM csv_tail_q")
        .collect().map(r => (r.getInt(0), r.getString(1), r.getInt(2))).sortBy(_._1)
      assert(rows.toSeq == Seq((0, "ALGERIA", 0), (1, "ARGENTINA", 1), (2, "BRAZIL", 1)),
        s"late csv file must be ingested exactly once, typed: ${rows.toSeq}")
    } finally q.stop()
  }
}
