package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** latest_by_scn must match max_by's semantics exactly — including rows
  * whose ordering value is NULL, which max_by skips (a primitive input
  * encoder used to crash the whole job on the first null scn instead).
  */
class LatestBySpec extends SparkSpec {

  test("null scn rows are skipped, like max_by") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (Some(1L), 10L, "a"),
      (Some(3L), 10L, "c"),
      (None: Option[Long], 10L, "z"), // null scn: must be ignored, not crash
      (Some(2L), 20L, "b"),
      (None: Option[Long], 30L, "only-null")
    ).toDF("scn", "id", "v")
    val got = df.groupBy("id")
      .agg(
        LatestBy.latest_by_scn(col("scn"), col("v")).as("udaf_v"),
        max_by(col("v"), col("scn")).as("maxby_v"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2)))).toMap
    assert(got(10L) == (("c", "c")))
    assert(got(20L) == (("b", "b")))
    // a group with ONLY null-ordering rows yields null from both
    assert(got(30L)._1 == null && got(30L)._2 == null)
  }
}
