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

  // ---- mid-stream evolution through Stream.materialize (auto.evolve
  // parity, reference README.md:839): the connector restarts with a
  // WIDER row schema after a captured DDL; the existing bucketed state
  // must keep working — old rows null in the new column, only touched
  // buckets rewritten widened, restart-safe from the same checkpoint.

  import org.apache.spark.sql.types.{StructField, StructType, LongType, StringType, DoubleType}

  private val v1Schema = StructType(Seq(
    StructField("scn", LongType), StructField("id", LongType),
    StructField("op", StringType), StructField("value", DoubleType)))
  private val v2Schema = StructType(v1Schema.fields.toSeq :+ StructField("note", StringType))

  private def tmp(prefix: String) = {
    val p = Files.createTempDirectory(prefix)
    p.toFile.deleteOnExit()
    p
  }

  private def run(in: java.nio.file.Path, statePath: String, chk: java.nio.file.Path,
      schema: StructType): Unit = {
    val feed = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 2).json(in.toString)
    Stream.materialize(feed, Seq("id"), Seq("scn"), statePath, chk.toString)
      .awaitTermination()
  }

  test("materialize survives a mid-stream schema widening across restart (auto.evolve)") {
    val (in, state, chk) = (tmp("ev-in"), tmp("ev-st"), tmp("ev-chk"))
    val statePath = state.resolve("t").toString
    // phase 1: v1 schema — ids 0..39 so every bucket is populated
    val v1Lines = (0 until 40).map(i => s"""{"scn":$i,"id":$i,"op":"c","value":${i / 2.0}}""")
    Files.write(in.resolve("a-0.json"), String.join("\n", v1Lines: _*).getBytes)
    run(in, statePath, chk, v1Schema)
    // phase 2 (restart, same checkpoint): v2 schema adds `note`; the
    // delta touches id=1 (update, note set) and id=1000 (new key)
    Files.write(in.resolve("b-0.json"), String.join("\n",
      s"""{"scn":100,"id":1,"op":"u","value":9.5,"note":"evolved"}""",
      s"""{"scn":101,"id":1000,"op":"c","value":7.0,"note":"fresh"}""").getBytes)
    run(in, statePath, chk, v2Schema)
    val cur = Stream.readCurrentState(spark, statePath)
    assert(cur.columns.contains("note"), "state schema must widen")
    val byId = cur.collect()
      .map(r => r.getAs[Long]("id") ->
        ((r.getAs[Double]("value"), Option(r.getAs[String]("note"))))).toMap
    assert(byId.size == 41)
    assert(byId(1L) == ((9.5, Some("evolved"))), byId(1L).toString)
    assert(byId(1000L) == ((7.0, Some("fresh"))))
    // pre-evolution rows in untouched buckets read as null through merge
    assert(byId(2L) == ((1.0, None)), byId(2L).toString)
    // phase 3: an update whose payload pre-dates the DDL (narrower than
    // state — the other alignment direction) still folds; its note is null
    Files.write(in.resolve("c-0.json"),
      s"""{"scn":102,"id":3,"op":"u","value":1.25}""".getBytes)
    run(in, statePath, chk, v1Schema)
    val after = Stream.readCurrentState(spark, statePath).collect()
      .map(r => r.getAs[Long]("id") ->
        ((r.getAs[Double]("value"), Option(r.getAs[String]("note"))))).toMap
    assert(after(3L) == ((1.25, None)))
    assert(after(1L) == ((9.5, Some("evolved"))), "other keys untouched by phase 3")
  }

  test("evolution boundary is restart-safe: widened state accepts further v2 batches after stop") {
    val (in, state, chk) = (tmp("ev2-in"), tmp("ev2-st"), tmp("ev2-chk"))
    val statePath = state.resolve("t").toString
    Files.write(in.resolve("a-0.json"), String.join("\n",
      s"""{"scn":1,"id":1,"op":"c","value":1.0}""",
      s"""{"scn":2,"id":2,"op":"c","value":2.0}""").getBytes)
    run(in, statePath, chk, v1Schema)
    Files.write(in.resolve("b-0.json"),
      s"""{"scn":3,"id":2,"op":"u","value":2.5,"note":"n1"}""".getBytes)
    run(in, statePath, chk, v2Schema)
    // stop/restart AFTER the evolution, more v2 data, same checkpoint
    Files.write(in.resolve("c-0.json"), String.join("\n",
      s"""{"scn":4,"id":1,"op":"u","value":1.5,"note":"n2"}""",
      s"""{"scn":5,"id":2,"op":"d","value":0.0}""").getBytes)
    run(in, statePath, chk, v2Schema)
    val cur = Stream.readCurrentState(spark, statePath).collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[Double]("value"), r.getAs[String]("note")))
      .toSet
    assert(cur == Set((1L, 1.5, "n2")), cur.toString)
  }
}
