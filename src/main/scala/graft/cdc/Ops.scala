package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Batch CDC dataflow operators (SURVEY.md §2.2) — the reference's core
  * "query", re-expressed as declarative Spark plans.
  *
  * Scale notes (the part that matters at 100 TB):
  *  - `applyChanges` uses `max_by(struct(payload), struct(ordering))`
  *    instead of the textbook `row_number()` window. Both are one shuffle
  *    on the key, but the aggregate gets a map-side partial (each input
  *    partition reduces to ≤ |distinct keys in partition| rows before the
  *    exchange), while a window must shuffle *every* change event and sort
  *    each partition. On a change stream with many updates per key that is
  *    the difference between shuffling |keys| rows and |events| rows.
  *  - Everything is expression-only (no UDFs, no RDDs) so whole-stage
  *    codegen applies end-to-end and filters push into the scan.
  */
object Ops {

  /** Source-side table allowlist — the reference drops all redo except the
    * configured schema/table before anything else runs
    * (`scripts/OpenLogReplicator.json:32-39`). Expressed as a plain filter
    * so Catalyst pushes it into the file scan (directory/row-group prune).
    */
  def tableFilter(env: DataFrame, schemaName: String, tableName: String): DataFrame =
    env.filter(col("source.schema") === schemaName && col("source.table") === tableName)

  /** Parse raw JSON change messages into the typed envelope
    * (OLR `"format":{"type":"json"}`, `scripts/OpenLogReplicator.json:15`).
    */
  def envelopeParse(raw: DataFrame, jsonCol: String, rowSchema: StructType): DataFrame =
    raw
      .withColumn("v", from_json(col(jsonCol), Envelope.schema(rowSchema)))
      .select(col("v.*"))

  /** Envelope parse with DEAD-LETTER routing: rows `from_json` cannot
    * parse keep their raw payload under `status='dead'` instead of
    * poisoning or aborting the pipeline; good rows flow on as
    * `status='ok'`. The raw bytes are retained (the dead-letter-queue
    * contract — corrupt input is data to quarantine and replay, not an
    * exception), and the whole thing stays one narrow codegen'd
    * projection. A valid envelope always carries `op`, so null-op after
    * parse identifies corruption.
    */
  def parseWithDeadLetter(raw: DataFrame, jsonCol: String, rowSchema: StructType): DataFrame =
    raw
      .withColumn("v", from_json(col(jsonCol), Envelope.schema(rowSchema)))
      .withColumn("status",
        when(col("v").isNotNull && col("v.op").isNotNull, "ok").otherwise("dead"))

  /** ExtractNewRecordState-equivalent (reference `README.md:844-848`):
    * envelope → flat row. Deletes are REWRITTEN, not dropped
    * (`delete.handling.mode=rewrite`): the row payload for op='d' comes
    * from the before-image and `__deleted` is the string 'true'/'false',
    * matching the observed auto-created sink table (FIXTURES.md A2).
    */
  def unwrap(env: DataFrame): DataFrame = {
    val payload = when(col("op") === "d", col("before")).otherwise(col("after"))
    val rowFields = env.schema("after").dataType.asInstanceOf[StructType].fieldNames
    val cols = rowFields.map(f => payload.getField(f).as(f)) ++ Seq(
      when(col("op") === "d", lit("true")).otherwise(lit("false")).as("__deleted"),
      col("source.scn").as("scn"),
      col("op")
    )
    env.select(cols.toSeq: _*)
  }

  /** Materialize a change stream into its current-state table: last event
    * per key wins (ordered by `ordering`, e.g. scn then ts_ms), op='d'
    * removes the row. The reference does this in the JDBC sink
    * (`insert.mode=upsert` + `delete.enabled`, `README.md:840-845`); here
    * it is a single aggregation with map-side combine.
    *
    * `payload` = the columns to carry into the materialized row (must not
    * overlap `keys`); `ordering` must be a total order (add tiebreakers).
    */
  def applyChanges(
      feed: DataFrame,
      keys: Seq[String],
      ordering: Seq[String],
      opCol: String = "op",
      payload: Seq[String] = Seq.empty
  ): DataFrame = {
    val requested = if (payload.nonEmpty) payload else feed.columns.toSeq.diff(keys)
    // opCol is always carried INTERNALLY (the delete filter below needs
    // it) and dropped from the output when the caller's payload omitted
    // it — a payload without `op` used to fail at analysis.
    val carry = if (requested.contains(opCol)) requested else requested :+ opCol
    latestPerKey(feed, keys, ordering, carry)
      .filter(col(opCol) =!= "d")
      .select(keys.map(col) ++ requested.map(col): _*)
  }

  /** Latest event per key (deletes INCLUDED — the upsert-sink feed shape:
    * op='d' rows become DELETE statements downstream, everything else an
    * upsert). Same map-side-combine `max_by` aggregation as
    * [[applyChanges]], which is this plus the tombstone filter.
    */
  def latestPerKey(
      feed: DataFrame,
      keys: Seq[String],
      ordering: Seq[String],
      carry: Seq[String] = Seq.empty
  ): DataFrame = {
    val fields = if (carry.nonEmpty) carry else feed.columns.toSeq.diff(keys)
    val ordKey = struct(ordering.map(col): _*)
    feed
      .groupBy(keys.map(col): _*)
      .agg(max_by(struct(fields.map(col): _*), ordKey).as("__latest"))
      .select(keys.map(col) ++ fields.map(f => col(s"__latest.$f").as(f)): _*)
  }

  /** Per-bucket (count, order-insensitive XOR checksum) summary of a
    * materialized state — the pt-table-checksum / sink-parity protocol
    * (round 15). Source and sink each run this independently over their
    * own copy; equal summaries prove row-level parity without ever
    * co-locating rows, and the output is constant-size (≤ `buckets`
    * rows) regardless of state size — the only parity shape that works
    * at 100 TB. `rowStr` is the caller's canonical row serialization
    * (the cross-engine contract; mirror it in any oracle); it is hashed
    * to 56 bits (portable-BIGINT md5 idiom, [[graft.llm.Sampling.hashBucket]])
    * so the XOR stays in range. XOR cancellation requires duplicate
    * serializations — impossible when `rowStr` embeds the unique key.
    */
  def bucketChecksum(state: DataFrame, idCol: String, rowStr: Column,
      buckets: Int = 64): DataFrame =
    state
      .select(pmod(col(idCol), lit(buckets.toLong)).as("bucket"),
        graft.llm.Sampling.hashBucket(rowStr, hexDigits = 14).as("h"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_rows"), expr("bit_xor(h)").as("checksum"))
      .orderBy("bucket")

  /** Incremental maintenance of a [[bucketChecksum]] summary — the
    * at-scale half of the parity protocol (round 15): (count, XOR) per
    * bucket forms a commutative group, and XOR is its own inverse, so a
    * batch's effect on the summary is computable from the touched keys'
    * BEFORE and AFTER rows alone — O(batch), never an O(state) rescan.
    * A 100 TB sink maintains its audit summary this way batch-by-batch;
    * the periodic full [[bucketChecksum]] recompute only arbitrates
    * when summaries disagree. `removed` = the touched keys' prior state
    * rows (before-images), `added` = their new state rows; both must
    * use the SAME `rowStr` serialization as the summary being updated.
    * Buckets whose count reaches zero drop out, keeping the summary
    * canonical (equal to the from-scratch form row-for-row).
    */
  def updateChecksum(prev: DataFrame, removed: DataFrame, added: DataFrame,
      idCol: String, rowStr: Column, buckets: Int = 64): DataFrame = {
    val rm = bucketChecksum(removed, idCol, rowStr, buckets)
      .withColumnRenamed("n_rows", "rm_n").withColumnRenamed("checksum", "rm_cs")
    val ad = bucketChecksum(added, idCol, rowStr, buckets)
      .withColumnRenamed("n_rows", "ad_n").withColumnRenamed("checksum", "ad_cs")
    prev
      .join(rm, Seq("bucket"), "full_outer")
      .join(ad, Seq("bucket"), "full_outer")
      .select(col("bucket"),
        (coalesce(col("n_rows"), lit(0L)) - coalesce(col("rm_n"), lit(0L))
          + coalesce(col("ad_n"), lit(0L))).as("n_rows"),
        coalesce(col("checksum"), lit(0L))
          .bitwiseXOR(coalesce(col("rm_cs"), lit(0L)))
          .bitwiseXOR(coalesce(col("ad_cs"), lit(0L))).as("checksum"))
      .filter(col("n_rows") > 0)
      .orderBy("bucket")
  }

  /** Slowly-changing-dimension Type 2 materialization: instead of
    * keeping only the latest row per key (`applyChanges`), keep EVERY
    * version with its validity interval — `valid_from` = the event's scn,
    * `valid_to` = the next event's scn (null while open), `is_current`
    * for the open non-deleted version. The standard history-table
    * consumption of a CDC stream; one window over (key, scn), no joins.
    */
  def applyChangesScd2(
      feed: DataFrame,
      keys: Seq[String],
      scnCol: String,
      opCol: String,
      // extra ordering columns appended when scn alone is not a total
      // order per key (applyChanges documents the same requirement and
      // lets callers add tiebreakers; this path previously could not).
      // Duplicate-(key, scn) notes: an EXACT redelivered duplicate is
      // benign even without a tiebreak — the two identical copies yield
      // one empty interval (valid_to == valid_from, invisible to
      // probeState) and one real one, same observable state either way;
      // only DISTINCT payloads at one (key, scn) need a tiebreaker to
      // be deterministic.
      tiebreak: Seq[String] = Nil
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy((scnCol +: tiebreak).map(col): _*)
    feed
      .withColumn("valid_from", col(scnCol))
      .withColumn("valid_to", lead(col(scnCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull && col(opCol) =!= "d")
  }

  /** Point-in-time state query — flashback/snapshot-SCN semantics (the
    * reference's snapshot reads run AS OF SCN under the FLASHBACK grant,
    * `scripts-db/set-up-orl.sql:228`): the current state as it stood at
    * `asOf`, i.e. the latest event per key with `scn <= asOf`, deletes
    * applied. Composed from the SCD2 history ([[applyChangesScd2]]):
    * ONE window builds every version's validity interval, then any
    * point-in-time read is a plain filter over it — the right shape when
    * history is materialized once and probed at many SCNs (vs re-folding
    * the feed per probe). `stateAsOf(max scn) ≡ applyChanges` by
    * construction (proven in ApplyChangesSpec).
    */
  def stateAsOf(
      feed: DataFrame,
      keys: Seq[String],
      scnCol: String,
      opCol: String,
      asOf: Column
  ): DataFrame =
    probeState(stateHistory(feed, keys, scnCol, opCol), opCol, asOf)

  /** The materialize-once half of the N-probe flashback shape: the full
    * SCD2 validity-interval history, built with ONE window over the feed.
    * Callers probing many SCNs persist (or write out) this result and run
    * [[probeState]] per probe — each probe is then a plain filter over
    * the materialized intervals, no window re-run (asserted plan-level in
    * ApplyChangesSpec). At 100 TB the history is written once per
    * snapshot cadence and every flashback query is a pruned scan.
    */
  def stateHistory(
      feed: DataFrame,
      keys: Seq[String],
      scnCol: String,
      opCol: String
  ): DataFrame =
    applyChangesScd2(feed, keys, scnCol, opCol)

  /** One point-in-time probe over a [[stateHistory]] result: the version
    * whose validity interval covers `asOf`, deletes applied. Pure filter +
    * projection — composes with a persisted/stored history so k probes
    * cost k scans (bucket/partition-prunable on the interval columns),
    * not k window jobs.
    */
  def probeState(history: DataFrame, opCol: String, asOf: Column): DataFrame =
    history
      .filter(col("valid_from") <= asOf &&
        (col("valid_to").isNull || col("valid_to") > asOf) &&
        col(opCol) =!= "d")
      .drop("valid_from", "valid_to", "is_current")

  /** Incremental aggregate-view maintenance: update `view0 = state0
    * grouped by groupCol` under a change-feed `delta` WITHOUT recomputing
    * from history — retract the touched keys' old contributions (−),
    * add their post-delta ones (+), and merge additively. Correct for
    * self-inverse aggregates (count, sum); exact because the measure is
    * integral (`centsOf` below). At 100 TB the win is the plan shape:
    * the feed's history is never rescanned — only `state0` (semi-joined
    * down to the delta's keys, i.e. bucket-prunable) and the delta move,
    * so per-batch cost is O(|delta| + |touched state|), not O(|history|)
    * (proven plan-level in IncrementalAggSpec).
    *
    * `state0` must be an [[applyChanges]]-shaped current state carrying
    * `keys`, `ordering`, `opCol` and `groupCol`/`valueCol`; returns the
    * updated view `(groupCol, cnt, cents)`.
    *
    * PRECONDITION (in-order delta): every delta event's ordering value
    * must exceed the point state0 was folded to. applyChanges-shaped
    * state DROPS tombstones, so a stale delta event older than a delete
    * already folded into state0 would win the re-fold and resurrect the
    * key here while a full recompute (which still sees the tombstone)
    * suppresses it. This holds by construction when the delta is the
    * exactly-once channel's next batch (the reference's checkpoint
    * protocol guarantees monotone SCN hand-off); a pipeline that can
    * replay across the fold point must instead feed a
    * [[latestPerKey]]-shaped state0 (tombstones retained — the
    * materialize sink's format) and filter op='d' only in the view
    * stages.
    */
  def incrementalAgg(
      state0: DataFrame,
      delta: DataFrame,
      keys: Seq[String],
      ordering: Seq[String],
      groupCol: String,
      valueCol: String
  ): DataFrame = {
    // integral measure: exact under retraction (a double sum would drift
    // against the recompute by addition order)
    def centsOf(df: DataFrame): Column =
      sum(round(df(valueCol) * 100).cast("long"))
    def viewOf(df: DataFrame, sign: Int): DataFrame =
      df.groupBy(df(groupCol)).agg(
        (count(lit(1)) * sign).as("cnt"),
        (centsOf(df) * sign).as("cents"))
    val view0 = viewOf(state0, 1)
    // the delta's key set is small — broadcast the semi-join so touching
    // state0 costs a pruned probe, not a shuffle of the full state
    val touched = state0.join(
      broadcast(delta.select(keys.map(col): _*).distinct()), keys, "left_semi")
    val after = applyChanges(touched.unionByName(delta.select(touched.columns.map(col).toSeq: _*)),
      keys, ordering)
    view0
      .unionByName(viewOf(touched, -1))
      .unionByName(viewOf(after, 1))
      .groupBy(col(groupCol))
      .agg(sum(col("cnt")).as("cnt"), sum(col("cents")).as("cents"))
      .filter(col("cnt") > 0)
  }

  /** Reference-faithful wire format (FIXTURES.md A1/A2, observed sink
    * table `.idea/dataSources/d5573bb8-...xml:4132-4209`): every NUMBER
    * column travels as a STRING (`decimal.handling.mode=string`,
    * README.md:823 — including the scale-0 PK) and DATE/TIMESTAMP as
    * epoch-millisecond INT64 (`time.precision.mode=adaptive`,
    * README.md:824). Applied at the envelope boundary only — the engine
    * computes on native types (SURVEY.md §1.2).
    */
  def toWireFormat(df: DataFrame): DataFrame =
    df.select(df.schema.fields.map { f =>
      f.dataType match {
        case _: org.apache.spark.sql.types.NumericType if f.name != "scn" =>
          col(f.name).cast("string").as(f.name)
        case org.apache.spark.sql.types.TimestampType =>
          unix_millis(col(f.name)).as(f.name)
        case org.apache.spark.sql.types.TimestampNTZType =>
          unix_millis(col(f.name).cast("timestamp")).as(f.name)
        case org.apache.spark.sql.types.DateType =>
          // adaptive time mode sends DATE as the epoch-DAY integer (the
          // fixtures carry only timestamps, but a DATE source column must
          // not leak through as a native date)
          datediff(col(f.name), lit("1970-01-01")).cast("long").as(f.name)
        case _ => col(f.name)
      }
    }.toSeq: _*)

  /** Per-transaction grouping (OLR emits XID on every event,
    * `scripts/OpenLogReplicator.json:26`; commit-boundary messages
    * `message: 2` at `:20`): reassemble per-transaction batches with
    * their SCN span. `collect_list` is wrapped in `array_sort` for
    * deterministic output (SURVEY.md §7.5).
    */
  def txnGroup(feed: DataFrame, xidCol: String, scnCol: String, opCol: String): DataFrame =
    feed
      .groupBy(col(xidCol))
      .agg(
        count(lit(1)).as("n_events"),
        min(col(scnCol)).as("first_scn"),
        max(col(scnCol)).as("last_scn"),
        array_sort(collect_list(col(opCol))).as("ops")
      )

  /** Kafka-record shaping: key = PK struct (`pk.mode=record_key`,
    * `pk.fields=ID`, reference `README.md:841-842`), topic =
    * `prefix.SCHEMA.TABLE` (`topic.prefix` `README.md:805`). In Spark
    * terms the topic is a routing column and the key the partitioning
    * column — `repartition(col("key.*"))` reproduces Kafka's per-key
    * ordering domain.
    */
  def route(env: DataFrame, topicPrefix: String, keyFields: Seq[String]): DataFrame = {
    val payload = when(col("op") === "d", col("before")).otherwise(col("after"))
    env.withColumn("topic",
        concat_ws(".", lit(topicPrefix), col("source.schema"), col("source.table")))
      .withColumn("key", struct(keyFields.map(f => payload.getField(f).as(f)): _*))
  }

  /** Tag a consistent batch read as snapshot records (`op='r'`,
    * `snapshot.mode=initial`, reference `README.md:822`), ready to be
    * unioned ahead of the live stream (§3.2 batch→stream handoff).
    */
  def snapshot(table: DataFrame, scn: Long): DataFrame =
    table
      .withColumn("op", lit("r"))
      .withColumn("scn", lit(scn))

  /** Chunked incremental snapshot — the DBLog / Debezium
    * incremental-snapshot algorithm (reference: Debezium's
    * `incremental.snapshot.chunk.size`, the watermark-based snapshot
    * windows of the DBLog paper), batch-simulated so the merge semantics
    * are oracle-checkable: the base table is "read" in `nChunks`
    * contiguous key-range chunks, chunk `i` at watermark scn
    * `wm_i = floor(maxScn·(i+1)/nChunks)` — i.e. after that prefix of the
    * live change stream has already been applied — and the read rows are
    * then merged with the full live stream such that a change event
    * AFTER a chunk's watermark supersedes the (stale) chunk row, while a
    * chunk row supersedes the change events it already embodies.
    *
    * Contract (pinned by ChunkedSnapshotSpec and the `snapshot_chunked`
    * oracle): the result is EXACTLY `applyChanges(snapshot ∪ feed)` —
    * chunking must be invisible in the final state, which is the whole
    * point of the algorithm (a consistent snapshot without ever locking
    * the table or replaying it atomically).
    *
    * Inputs must be union-compatible: `base` stamped `scn=0, op='r'`
    * (see [[snapshot]]), `feed` the live events. `keyCol` must be
    * numeric (chunk ranges are arithmetic on it).
    *
    * Shape at 100 TB: no driver collect — the three scalars (max scn,
    * key bounds) travel as a broadcast 1-row join, same pattern as
    * `state_asof`; per-key "state as of my chunk's watermark" is ONE
    * `max_by` aggregation over the filtered union (the watermark is a
    * pure function of the key, so no per-chunk pass exists anywhere);
    * the final merge is a second `max_by` on the same key — two
    * key-shuffles total, both behind map-side partials, independent of
    * `nChunks`. A real cluster would page chunk READS through time;
    * the merge dataflow is identical.
    */
  def chunkedSnapshot(
      base: DataFrame,
      feed: DataFrame,
      keyCol: String,
      scnCol: String,
      opCol: String,
      nChunks: Int
  ): DataFrame = {
    val payload = base.unionByName(feed).columns.toSeq.filterNot(_ == keyCol)
    val chunkRows = chunkStates(base, feed, keyCol, scnCol, opCol, nChunks)
      .withColumn("__ord", col("__wm"))
      .select(col(keyCol) +: (payload :+ "__ord").map(col): _*)
    // merge reads with the live stream: highest (arrival, scn, liveness)
    // wins — a post-watermark change supersedes its stale chunk row; a
    // chunk row supersedes the (identical-payload) events it embodies
    val merged = chunkRows
      .unionByName(feed.withColumn("__ord", col(scnCol))
        .select(col(keyCol) +: (payload :+ "__ord").map(col): _*))
      .groupBy(col(keyCol))
      .agg(max_by(struct(payload.map(col): _*),
        struct(col("__ord"), col(scnCol), col(opCol) =!= "r")).as("__st"))
      .select(col(keyCol) +: payload.map(f => col(s"__st.$f").as(f)): _*)
    merged.filter(col(opCol) =!= "d")
  }

  /** Per key: the state its chunk's watermark read observes (original
    * payload incl. its true scn/op) plus `__wm`, deletes observed as
    * absence. Shared by [[chunkedSnapshot]] (batch merge) and
    * [[chunkReadEvents]] (live-stream injection).
    */
  private def chunkStates(
      base: DataFrame,
      feed: DataFrame,
      keyCol: String,
      scnCol: String,
      opCol: String,
      nChunks: Int
  ): DataFrame = {
    require(nChunks >= 1, s"nChunks must be >= 1, got $nChunks")
    // r19 note (measured, REJECTED): repartitioning base ∪ feed by the
    // group key before the max_by looked like the §2.5 input-skew fix
    // for the single-row-group fixture scans, but it (a) leaked the
    // repartition into the bounds branch (a full extra row shuffle for
    // a 1-row aggregate) and (b) turned both map-side-partial hash
    // aggregates into adjacent SortAggregates — shuffling |events| rows
    // and sorting them instead of shuffling |keys| partials, exactly
    // the trade applyChanges' scaladoc rejects at 100 TB. Net local
    // delta was within noise; the partial-agg shape stays.
    val all = base.unionByName(feed)
    val payload = all.columns.toSeq.filterNot(_ == keyCol)
    val bounds = all.agg(
      max(col(scnCol)).as("__maxscn"),
      min(col(keyCol)).as("__minkey"),
      max(col(keyCol)).as("__maxkey"))
    val tagged = all.join(broadcast(bounds))
    // contiguous key-range chunk 0..nChunks-1, its read watermark, and
    // the snapshot-order tiebreak: at EQUAL scn a live change outranks
    // the scn-0 base read (base and a scn-0 event would otherwise tie
    // nondeterministically in max_by). ALL arithmetic runs in
    // DECIMAL(38,0) with exact integer division ((n − n mod d) / d —
    // an exact-multiple decimal divide can never round): a LONG key
    // column spanning most of its range (hash-derived 64-bit ids,
    // min ≈ Long.MinValue) wraps both (key − min) · nChunks and the
    // denominator (max − min + 1) in long arithmetic, and a plain `/`
    // on longs is DOUBLE division, which mis-floors past 2⁵³ — either
    // silently drops untouched base rows (negative wm) or mis-chunks
    // keys at the boundaries.
    val keyD = col(keyCol).cast("decimal(38,0)")
    val minD = col("__minkey").cast("decimal(38,0)")
    val maxD = col("__maxkey").cast("decimal(38,0)")
    def exactDiv(n: org.apache.spark.sql.Column, d: org.apache.spark.sql.Column) =
      ((n - pmod(n, d)) / d).cast("long")
    val num = (keyD - minD) * lit(nChunks)
    val den = (maxD - minD) + lit(1)
    val chunk = exactDiv(num, den)
    val wmNum = col("__maxscn").cast("decimal(38,0)") * (chunk + 1)
    val wm = exactDiv(wmNum, lit(nChunks).cast("decimal(38,0)"))
    val ord = struct(col(scnCol), col(opCol) =!= "r")
    tagged
      .withColumn("__wm", wm)
      .filter(col(scnCol) <= col("__wm"))
      .groupBy(col(keyCol))
      .agg(max_by(struct((payload.map(col) :+ col("__wm")): _*), ord).as("__st"))
      .select(col(keyCol) +: (payload :+ "__wm").map(f => col(s"__st.$f").as(f)): _*)
      .filter(col(opCol) =!= "d")
  }

  /** The chunk reads of [[chunkedSnapshot]] in WIRE form: each surviving
    * key's chunk-state re-stamped as a read event (`op='r'`,
    * `scn = its chunk's watermark`), ready to be injected into a LIVE
    * [[Stream.materialize]] whose ordering is `(scn, src-rank)` with
    * reads ranked BELOW stream events — the engine's
    * snapshot-while-streaming form of the Debezium incremental snapshot:
    * the stream never stops, chunk files simply arrive as extra
    * micro-batch input, and the last-write-wins fold IS the watermark
    * merge (a post-watermark change supersedes the read because its scn
    * is higher; an embodied change loses because its scn is at or below
    * the read's watermark, where the read's higher/equal scn + the
    * equal-scn rank rule settle it; a read can never resurrect a
    * tombstone that outranks it). Pinned in ChunkedSnapshotSpec's
    * live-stream test.
    */
  def chunkReadEvents(
      base: DataFrame,
      feed: DataFrame,
      keyCol: String,
      scnCol: String,
      opCol: String,
      nChunks: Int
  ): DataFrame =
    chunkStates(base, feed, keyCol, scnCol, opCol, nChunks)
      .withColumn(scnCol, col("__wm"))
      .withColumn(opCol, lit("r"))
      .drop("__wm")

  /** As-of join: for each left row, the latest right row with
    * `right.ts <= left.ts` on equal keys — the CDC point-in-time lookup.
    *
    * Spark has no native as-of join. The naive composition (range
    * equi-join + per-left-row aggregation) materializes every
    * (left, earlier-right) match — O(|left| × versions-per-key)
    * intermediate rows. This implementation is the scalable union+fold
    * form instead: tag both sides, union, ONE shuffle on the key, sort
    * each key by (ts, side, ordering) and carry the last-seen right
    * payload forward with `last(..., ignoreNulls)` over a running frame.
    * Right rows sort before left rows at equal ts (inclusive `<=`), and
    * `rightOrd` breaks ties among same-ts right rows; inner-join
    * semantics (left rows with no earlier right row are dropped).
    *
    * Cost: shuffle+sort of |left|+|right| rows — no match blowup. This is
    * the plan shape a dedicated merge-scan as-of strategy would produce.
    */
  def asOfJoin(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTs: String,
      rightTs: String,
      rightPayload: Seq[String],
      rightOrd: Seq[String] = Seq.empty
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // SQL join semantics: NULL keys/timestamps never match. The window
    // partitionBy below would otherwise group null-keyed rows TOGETHER
    // (null-safe grouping), pairing null-key left rows with null-key
    // right payloads — rows the equivalent SQL join (and the DuckDB
    // oracle) never emits. The native AsOfJoinExec skips nulls in its
    // scan for the same reason.
    val leftF = left.filter(col(leftKey).isNotNull && col(leftTs).isNotNull)
    val rightF = right.filter(col(rightKey).isNotNull && col(rightTs).isNotNull)
    val ordCols = (if (rightOrd.nonEmpty) rightOrd else Seq(rightTs))
      .filterNot(_ == rightTs)
    val leftCols = left.columns.toSeq
    // the whole right payload travels as ONE struct so the window fill
    // can never mix fields from different right rows (null payload field
    // safety), and null-struct marks "no right row yet" for the inner
    // semantics filter.
    val rStructType = org.apache.spark.sql.types.StructType(
      rightPayload.map(c => right.schema(c).copy(name = c)))
    val lTagged = leftF.select(
      col(leftKey).as("__key") +:
        col(leftTs).as("__ts") +:
        lit(1).as("__side") +:
        leftCols.map(col) ++:
        ordCols.map(c => lit(null).cast(right.schema(c).dataType).as(s"__ord_$c")) :+
        lit(null).cast(rStructType).as("__r"): _*)
    val rTagged = rightF.select(
      col(rightKey).as("__key") +:
        col(rightTs).cast(left.schema(leftTs).dataType).as("__ts") +:
        lit(0).as("__side") +:
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++:
        ordCols.map(c => col(c).as(s"__ord_$c")) :+
        struct(rightPayload.map(col): _*).as("__r"): _*)
    val w = Window
      .partitionBy(col("__key"))
      .orderBy((col("__ts").asc +: col("__side").asc +: ordCols.map(c => col(s"__ord_$c").asc)): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = lTagged.unionByName(rTagged).select(
      col("__side") +: leftCols.map(col) :+
        last(col("__r"), ignoreNulls = true).over(w).as("__r"): _*)
    filled
      .filter(col("__side") === 1 && col("__r").isNotNull)
      .select(leftCols.map(col) ++ rightPayload.map(c => col(s"__r.$c").as(c)): _*)
  }
}
