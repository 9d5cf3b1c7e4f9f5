package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** JDBC source read (SURVEY.md §2.1 row 3 — the kafka-connect-jdbc-source
  * plugin, reference `Dockerfile:68-69`): pull-based table ingest through
  * Spark's built-in JDBC relation.
  *
  * The environment has no external database, so the query seeds an
  * embedded Derby database (the JDBC engine the Spark distribution
  * ships) from the fixture table, then reads it back through the REAL
  * `spark.read.format("jdbc")` path with a partitioned read —
  * `partitionColumn/lowerBound/upperBound/numPartitions`, the option set
  * that matters at scale: N executors each issue a range-predicated
  * query instead of one connection streaming the whole table through a
  * single task. Swapping the URL re-targets any JDBC database.
  */
object JdbcSource {

  private def seeded(s: SparkSession, dir: String): String = {
    // keep Derby's log out of the caller's CWD (driver runs from anywhere)
    if (System.getProperty("derby.stream.error.file") == null)
      System.setProperty("derby.stream.error.file",
        s"${System.getProperty("java.io.tmpdir")}/graft_derby.log")
    // per-dir in-memory database; seeding is idempotent (PK upsert).
    // The db name is a truncated sha-256 of the FULL dir string —
    // math.abs(hashCode) was the same lossy-path-mapping bug class the
    // spool dirs fixed (two dirs with colliding Int hashes would merge
    // their rows into one database; abs(Int.MinValue) is negative)
    val digest = java.security.MessageDigest.getInstance("SHA-256")
      .digest(dir.getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString
    val url = s"jdbc:derby:memory:src$digest;create=true"
    val nation = Tables(s, dir).nation.select("n_nationkey", "n_name", "n_regionkey")
    graft.sinks.JdbcUpsert.ensureTable(url, "nation_src", nation.schema, Seq("n_nationkey"))
    graft.sinks.JdbcUpsert.upsert(nation, url, "nation_src", Seq("n_nationkey"))
    url
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "jdbc_scan" -> ((s, dir) => {
      val url = seeded(s, dir)
      val df = s.read.format("jdbc")
        .option("url", url)
        .option("dbtable", "nation_src")
        // the parallel-read shape: 4 range-partitioned queries
        .option("partitionColumn", "n_nationkey")
        .option("lowerBound", "0")
        .option("upperBound", "25")
        .option("numPartitions", "4")
        .load()
      // Derby reports identifiers uppercased; schema back to engine form
      df.select(df.columns.map(c => col(c).as(c.toLowerCase)).toSeq: _*)
        .select(
          col("n_nationkey").cast("int").as("n_nationkey"),
          col("n_name"),
          col("n_regionkey").cast("int").as("n_regionkey"))
        .orderBy("n_nationkey")
    })
  )

  def oracleSql: Map[String, String] = Map(
    "jdbc_scan" ->
      "SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey"
  )
}
