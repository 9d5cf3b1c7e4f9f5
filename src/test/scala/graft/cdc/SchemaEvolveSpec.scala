package graft.cdc

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Schema evolution (SURVEY.md §2.2: the reference sink auto-evolves,
  * `auto.evolve=true` README.md:839, DDL history recorded): new columns
  * appear mid-stream; old data reads as null for them and replay unions
  * align by NAME, not position.
  */
class SchemaEvolveSpec extends SparkSpec {

  test("parquet mergeSchema reads pre-DDL files with nulls in new columns") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("evolve").toString
    Seq((1L, "a"), (2L, "b")).toDF("id", "name")
      .write.parquet(s"$dir/batch=0")
    Seq((3L, "c", 9.99), (4L, "d", 1.50)).toDF("id", "name", "price")
      .write.parquet(s"$dir/batch=1")
    val merged = s.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.sorted.toSeq == Seq("batch", "id", "name", "price"))
    val rows = merged.orderBy("id")
      .collect().map(r => (r.getAs[Long]("id"), Option(r.get(r.fieldIndex("price")))))
    assert(rows.toSeq == Seq((1L, None), (2L, None), (3L, Some(9.99)), (4L, Some(1.5))))
  }

  test("unionByName with allowMissingColumns replays mixed-schema change batches") {
    val s = spark
    import s.implicits._
    val v1 = Seq((1L, "c", "x")).toDF("id", "op", "name")
    val v2 = Seq((2L, "c", "y", 5.0)).toDF("id", "op", "name", "price")
    val replay = v1.unionByName(v2, allowMissingColumns = true)
    assert(replay.columns.toSeq == Seq("id", "op", "name", "price"))
    val byId = replay.collect().map(r => r.getAs[Long]("id") ->
      Option(r.get(r.fieldIndex("price")))).toMap
    assert(byId == Map(1L -> None, 2L -> Some(5.0)))
  }

  test("evolved feed flows through apply_changes (late column wins where set)") {
    val s = spark
    import s.implicits._
    val v1 = Seq((1L, 1L, "c", "x")).toDF("scn", "id", "op", "name")
    val v2 = Seq((2L, 1L, "u", "x2", 5.0)).toDF("scn", "id", "op", "name", "price")
    val feed = v1.unionByName(v2, allowMissingColumns = true)
    val state = Ops.applyChanges(feed, keys = Seq("id"), ordering = Seq("scn")).collect()
    assert(state.length == 1)
    assert(state.head.getAs[String]("name") == "x2")
    assert(state.head.getAs[Double]("price") == 5.0)
  }
}
