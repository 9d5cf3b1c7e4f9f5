package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental SemDeDup admission — the embedding twin of
  * NearDedup.admitBatch, with the same contract family: state keepers
  * are never re-judged, batch vectors admit greedily in id order
  * against state + earlier-admitted keepers of their (split) cell,
  * redelivery is id-guarded, and the state accumulates across
  * restarts.
  *
  * Planted geometry (3-d unit vectors, threshold 0.9): x̂, a vector at
  * 25° from x̂ (cos ≈ 0.906 ≥ 0.9 — a near-dup), and one at 50°
  * (cos ≈ 0.64 vs x̂ — fresh; cos ≈ 0.906 vs the 25° vector).
  */
class SemDedupIncrSpec extends SparkSpec {
  import spark.implicits._

  private val T = 0.9
  private def deg(d: Double): Array[Float] = {
    val r = math.toRadians(d)
    Array(math.cos(r).toFloat, math.sin(r).toFloat, 0f)
  }
  // two centroids: x-axis cluster and z-axis cluster
  private val centroids = Array(Array(1.0, 0.0, 0.0), Array(0.0, 0.0, 1.0))

  private def assigned(rows: Seq[(Long, Array[Float])]): DataFrame =
    rows.toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"),
        VectorOps.ivfCell(col("embedding"), centroids).as("cell"),
        VectorOps.ivfCellRanks(col("embedding"), centroids, ranks = 3).as("__sub"))

  private def admitIds(batch: DataFrame, state: DataFrame): Set[Long] =
    VectorOps.semDedupAdmit(batch, state, threshold = T)
      .select("vec_id").as[Long].collect().toSet

  test("admission: state dups rejected, chains through the batch rejected, fresh admitted") {
    val state = assigned(Seq(2L -> Array(0f, 1f, 0f))) // ŷ keeper, cell 0's region
    // 11 ~ state 2 (cos 1.0 shifted? no — plant a near-dup of ŷ at 25° in the y-plane)
    val yNear = { val r = math.toRadians(25); Array(math.sin(r).toFloat, math.cos(r).toFloat, 0f) }
    val batch = assigned(Seq(
      11L -> yNear,        // cos vs state ŷ ≈ 0.906 → reject
      13L -> deg(0),       // x̂: cos vs ŷ = 0, vs yNear n/a → admit
      15L -> deg(25)       // cos vs 13 ≈ 0.906 → reject THROUGH the batch
    ))
    // all in the same coarse cell (x-y plane → centroid 0): the greedy
    // really compares them
    assert(batch.select("cell").distinct().as[Int].collect().toSeq == Seq(0))
    assert(admitIds(batch, state) == Set(13L))
  }

  test("grown state: renumbered replay admits nothing; a reject-only neighbor admits (documented divergence)") {
    val state0 = assigned(Seq(2L -> Array(0f, 1f, 0f)))
    val batch1 = assigned(Seq(13L -> deg(0), 15L -> deg(25)))
    val adm1 = VectorOps.semDedupAdmit(batch1, state0, threshold = T)
    assert(adm1.select("vec_id").as[Long].collect().toSet == Set(13L))
    val state1 = state0.unionByName(
      batch1.join(adm1.select("vec_id"), "vec_id")
        .select("vec_id", "embedding", "cell", "__sub"))
    // renumbered clones of batch1 all land on existing keepers → empty
    val replay = assigned(Seq(23L -> deg(0), 25L -> deg(25)))
    assert(admitIds(replay, state1).isEmpty)
    // 31 at 50°: cos vs keeper x̂ ≈ 0.64 < 0.9, its only near-dup was
    // the REJECTED 15 (25° away) — admitted, the same survivors-only
    // state divergence NearDedup.admitBatch documents
    val lone = assigned(Seq(31L -> deg(50)))
    assert(admitIds(lone, state1) == Set(31L))
  }

  test("keeper-state stability: a batch vector with a smaller id never evicts a state keeper") {
    // state keeper id 10; batch id 1 is a clone with a SMALLER id — a
    // batch rerun of the full core would keep 1 and drop 10, but
    // admission must preserve the state verdict and reject 1
    val state = assigned(Seq(10L -> deg(0)))
    val batch = assigned(Seq(1L -> deg(5)))
    assert(admitIds(batch, state).isEmpty)
  }

  test("untouched cells are not scanned: admission filters state by the batch's cell set") {
    val state = assigned(Seq(
      2L -> Array(0f, 1f, 0f),          // cell 0
      4L -> Array(0f, 0f, 1f)))         // cell 1 (z-axis)
    val batch = assigned(Seq(11L -> deg(40))) // cell 0 only
    // plan must semi-join the state on the batch's cell set: the
    // admitted result is correct AND the state row in cell 1 is
    // irrelevant (asserted behaviorally: admitting a z-clone later
    // still rejects, so the filter is a scan bound, not a semantics change)
    assert(admitIds(batch, state) == Set(11L))
    val zClone = assigned(Seq(13L -> Array(0.01f, 0f, 1f)))
    assert(admitIds(zClone, state).isEmpty)
  }

  test("streaming state fold: accumulates keepers across batches and restarts, replay-safe") {
    val s = spark
    val in = java.nio.file.Files.createTempDirectory("sem-in")
    val state = java.nio.file.Files.createTempDirectory("sem-st").resolve("t").toString
    val chk = java.nio.file.Files.createTempDirectory("sem-chk").toString
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("vec_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("embedding",
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType))))
    def line(id: Long, v: Array[Float]) =
      s"""{"vec_id":$id,"embedding":[${v.mkString(",")}]}"""
    def run(): Unit = {
      val feed = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).json(in.toString)
      VectorOps.semAdmitStream(feed, state, chk, centroids, threshold = T)
        .awaitTermination()
    }
    // batch 1: x̂ + an in-batch near-dup (25°) + an orthogonal keeper
    java.nio.file.Files.write(in.resolve("a-0.json"), String.join("\n",
      line(1, deg(0)), line(2, deg(25)), line(3, Array(0f, 0f, 1f))).getBytes)
    run()
    def stateIds = s.read.parquet(state).select("vec_id").as[Long].collect().toSet
    assert(stateIds == Set(1L, 3L))
    // batch 2 (restart, same checkpoint): REDELIVERED id 1 (id guard),
    // a clone of keeper 1 (rejected by admission), and a fresh vector
    java.nio.file.Files.write(in.resolve("b-0.json"), String.join("\n",
      line(1, deg(0)), line(4, deg(5)), line(5, deg(60))).getBytes)
    run()
    assert(stateIds == Set(1L, 3L, 5L))
    // state rows carry everything admission needs next batch
    val cols = s.read.parquet(state).columns.toSet
    assert(Set("vec_id", "embedding", "cell", "__sub").subsetOf(cols), cols.toString)
  }

  test("dedup_semantic_incr id: deterministic, disjoint from state, subset of the odd batch") {
    val df = graft.SparkEntry.queries("dedup_semantic_incr")(spark, sf("sf0.001"))
    val rows = df.select("vec_id").as[Long].collect()
    assert(rows.nonEmpty && rows.forall(_ % 2 != 0), "admitted ids must be odd (the batch)")
    assert(rows.sorted.sameElements(rows), "ordered output")
    val again = graft.SparkEntry.queries("dedup_semantic_incr")(spark, sf("sf0.001"))
      .select("vec_id").as[Long].collect()
    assert(rows.sameElements(again), "deterministic across invocations")
  }
}
