package graft.sinks

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** JDBC upsert sink — the reference's flagship delivery path
  * (`README.md:830-849`: Kafka-Connect JDBC sink with
  * `insert.mode=upsert`, `pk.mode=record_key`, `delete.enabled=true`),
  * re-expressed as an executor-side JDBC writer.
  *
  * Shape that matters on a cluster:
  *  - `foreachPartition`: every partition opens ITS OWN connection and
  *    writes its rows — N executors upsert in parallel, nothing funnels
  *    through the driver.
  *  - update-else-insert per row over a PreparedStatement pair (the
  *    portable upsert Kafka-Connect uses for dialects without MERGE),
  *    statements reused across the partition's rows.
  *  - rows with `op='d'` become DELETEs (`delete.enabled` rewrite).
  *
  * Callers feeding a CDC stream should reduce to latest-per-key first
  * ([[graft.cdc.Ops.latestPerKey]]) so per-key ordering is settled
  * BEFORE rows spread across partitions — [[upsertStream]] does exactly
  * that per micro-batch. Verified against embedded Derby (the JDBC
  * implementation the Spark distribution ships) in JdbcUpsertSpec;
  * swapping the URL re-targets any JDBC database.
  */
object JdbcUpsert {

  /** Reserved words that break unquoted DDL/DML somewhere in the
    * Derby / Postgres / MySQL / Oracle set — the plausible-CDC-column
    * subset of SQL:2016 + dialect extras, lower-cased for the lookup.
    */
  private val reservedWords: Set[String] = Set(
    "order", "user", "value", "values", "group", "key", "keys", "table",
    "select", "insert", "update", "delete", "from", "where", "join",
    "index", "column", "primary", "foreign", "references", "check",
    "constraint", "default", "level", "position", "date", "time",
    "timestamp", "year", "month", "day", "hour", "minute", "second",
    "action", "comment", "type", "role", "row", "rows", "range",
    "window", "partition", "offset", "limit", "grant", "revoke", "to",
    "in", "is", "not", "null", "and", "or", "like", "between", "case",
    "when", "then", "else", "end", "cast", "desc", "asc", "by", "all",
    "any", "some", "exists", "union", "except", "intersect", "current",
    "session", "schema", "function", "procedure", "trigger", "view",
    "sequence", "start", "number", "size", "mode", "language", "match",
    "both", "leading", "trailing", "natural", "cross", "inner", "outer",
    "left", "right", "full", "on", "using", "as", "distinct", "having")

  /** The case an UNQUOTED identifier folds to on the target database —
    * lower on the PostgreSQL family, upper on the SQL-standard family
    * (Derby, Oracle, H2, HSQLDB, DB2). MySQL/MariaDB preserve case but
    * compare case-insensitively on most platforms; upper is safe there.
    */
  private def foldCase(url: String): String => String = {
    val u = url.toLowerCase
    if (u.startsWith("jdbc:postgresql")) (s: String) => s.toLowerCase
    else (s: String) => s.toUpperCase
  }

  /** Quote an identifier ONLY when it needs quoting. Plain identifiers
    * stay bare, so each database applies its NATIVE case folding —
    * `e2e_state` resolves E2E_STATE on Derby/Oracle (up-folding) and
    * e2e_state on Postgres (down-folding), exactly as pre-existing
    * unquoted-created tables expect on BOTH families.
    *
    * A plain-shaped RESERVED word (`value`, `order`, …) must be quoted,
    * but quoting verbatim would freeze the caller's case into the
    * schema and split it from the unquoted up/down-folded siblings
    * (round-11 regression: Derby table `ID, EVENT_TYPE, "value", SCN`).
    * So it is folded to the dialect's unquoted-fold case FIRST:
    * `"VALUE"` on Derby/Oracle, `"value"` on Postgres — byte-identical
    * to what an unquoted CREATE would have stored, so the created
    * schema is case-uniform and pre-existing tables (created by either
    * the always-quote-uppercase releases on Derby/Oracle or plain
    * unquoted DDL anywhere) keep resolving.
    *
    * Escape hatches for what the best-effort [[reservedWords]] list
    * cannot know: an identifier arriving ALREADY double-quoted is
    * passed through verbatim after validation (caller controls the
    * exact stored case — use this for an unlisted dialect keyword), and
    * odd-character identifiers are quoted verbatim-case (the caller
    * necessarily knows the stored case, since only quoted DDL can have
    * created them).
    *
    * MIGRATION (pre-round-12 tables): releases before the fold fix
    * quoted reserved columns in the caller's verbatim case, so a table
    * auto-created then on Derby/Oracle may hold a lowercase `"value"`
    * where this release resolves `"VALUE"`. Such tables need a one-time
    * `RENAME COLUMN "value" TO value` (unquoted — lets the dialect
    * re-fold), or callers can pass the pre-quoted form `"\"value\""` to
    * keep addressing the legacy case exactly.
    */
  private def q(id: String, fold: String => String): String =
    if (id.length >= 2 && id.head == '"' && id.last == '"') {
      // pre-quoted: verbatim, but VALIDATED — every interior quote must
      // be a doubled pair, else the pass-through could splice raw SQL
      // into CREATE/UPDATE/INSERT text (`"x" DOUBLE); DROP TABLE t;--"`
      // would otherwise break out of the identifier). Stripping doubled
      // pairs first makes any remaining quote a breakout attempt.
      val interior = id.substring(1, id.length - 1)
      require(!interior.replace("\"\"", "").contains('"'),
        s"bad pre-quoted identifier $id: interior quotes must be doubled")
      id
    }
    else if (id.matches("[A-Za-z][A-Za-z0-9_]*")) {
      if (reservedWords.contains(id.toLowerCase)) "\"" + fold(id) + "\""
      else id
    } else "\"" + id.replace("\"", "\"\"") + "\""

  /** Table names may be schema-qualified (`app.state`): each
    * dot-separated part is quoted independently, so the qualifier
    * resolves as a schema rather than becoming one literal
    * `"app.state"` identifier. Empty parts (leading/trailing/double
    * dots) are rejected loudly rather than silently misresolving.
    */
  private def qTable(name: String, fold: String => String): String = {
    val parts = name.split('.')
    require(parts.nonEmpty && parts.forall(_.nonEmpty) && !name.endsWith("."),
      s"bad table name '$name': empty dot-separated part")
    parts.map(q(_, fold)).mkString(".")
  }

  private def sqlType(dt: DataType, isKey: Boolean): String = dt match {
    case LongType         => "BIGINT"
    case IntegerType      => "INTEGER"
    case ShortType        => "SMALLINT"
    case ByteType         => "SMALLINT" // no portable TINYINT (Derby lacks it)
    case DoubleType       => "DOUBLE"
    case FloatType        => "REAL"
    case BooleanType      => "BOOLEAN"
    case TimestampType | TimestampNTZType => "TIMESTAMP"
    case DateType         => "DATE"
    case d: DecimalType   => s"DECIMAL(${d.precision},${d.scale})"
    // key strings must be indexable → bounded VARCHAR; payload strings are
    // CLOB so an oversized CDC text field cannot 22001-truncate-error the
    // batch into a checkpoint-retried poison loop
    case StringType       => if (isKey) "VARCHAR(4096)" else "CLOB"
    case BinaryType       => "BLOB"
    case other => throw new IllegalArgumentException(s"no JDBC mapping for $other")
  }

  private def jdbcType(dt: DataType): Int = dt match {
    case LongType         => java.sql.Types.BIGINT
    case IntegerType      => java.sql.Types.INTEGER
    case ShortType        => java.sql.Types.SMALLINT
    case ByteType         => java.sql.Types.SMALLINT
    case DoubleType       => java.sql.Types.DOUBLE
    case FloatType        => java.sql.Types.REAL
    case BooleanType      => java.sql.Types.BOOLEAN
    case TimestampType | TimestampNTZType => java.sql.Types.TIMESTAMP
    case DateType         => java.sql.Types.DATE
    case _: DecimalType   => java.sql.Types.DECIMAL
    case StringType       => java.sql.Types.VARCHAR
    case BinaryType       => java.sql.Types.BLOB
    case _                => java.sql.Types.OTHER
  }

  /** Create the sink table from the DataFrame schema if absent —
    * Connect's `auto.create=true` analog (observed auto-created sink
    * table, FIXTURES.md A2).
    */
  def ensureTable(url: String, table: String, schema: StructType, keys: Seq[String]): Unit = {
    val fold = foldCase(url)
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      // Probe with a no-row SELECT instead of getTables metadata: each
      // database folds unquoted identifiers differently (Derby/Oracle
      // upper-case, Postgres lower-case), so a cased metadata lookup
      // misses existing tables and re-attempts CREATE. The SELECT goes
      // through the same identifier resolution the writes will use —
      // but only a TABLE-NOT-FOUND SQLState means "missing": a
      // permissions or connection error treated as missing would run
      // CREATE and fail with a message pointing AWAY from the real
      // cause (or silently split reads/writes across two schemas).
      val missingStates = Set(
        "42X05", // Derby
        "42P01", // PostgreSQL
        "42S02", // MySQL / SQL-92 ODBC
        "S0002") // older ODBC
      val exists =
        try { conn.createStatement().executeQuery(s"SELECT 1 FROM ${qTable(table, fold)} WHERE 1=0").close(); true }
        catch {
          case e: java.sql.SQLException
              if missingStates.contains(Option(e.getSQLState).getOrElse("")) ||
                Option(e.getMessage).exists(_.contains("ORA-00942")) => false
          case e: java.sql.SQLException =>
            throw new IllegalStateException(
              s"probing $table at $url failed for a reason other than " +
                s"table-not-found (SQLState ${e.getSQLState}) — refusing to " +
                "CREATE over an undiagnosed error", e)
        }
      if (!exists) {
        val cols = schema.fields
          .map(f => s"${q(f.name, fold)} ${sqlType(f.dataType, keys.contains(f.name))}").mkString(", ")
        val pk = if (keys.nonEmpty) s", PRIMARY KEY (${keys.map(q(_, fold)).mkString(", ")})" else ""
        conn.createStatement().execute(s"CREATE TABLE ${qTable(table, fold)} ($cols$pk)")
      }
    } finally conn.close()
  }

  /** Upsert `df` into `table`: per row, UPDATE by key, INSERT on zero
    * rows updated; `deleteOp` rows are DELETEd instead. `df` must have
    * at most one row per key (reduce with latestPerKey first).
    *
    * `ordCol` (e.g. scn) arms a last-write-wins guard: updates/deletes
    * only apply over rows with `ordCol <=` the incoming value, and an
    * insert racing a newer row loses on the PK and is skipped — so stale
    * REDELIVERED data can never regress the sink. Like the reference's
    * Connect sink (ordered Kafka partitions per key), a hard-DELETE
    * followed by an even staler update can still resurrect a row if the
    * channel reorders ACROSS batches; channels without per-key ordering
    * should sink the `__deleted` rewrite column ([[graft.cdc.Ops.unwrap]])
    * instead of hard deletes.
    */
  /** Lexicographic ordering guard over the FULL composite ordering:
    * `(c1 < ? OR (c1 = ? AND (c2 <= ?)))` etc. Guarding on only the head
    * column would let a stale redelivery that TIES on it (same scn,
    * older ts) overwrite newer sink state.
    */
  private def guardSql(cols: Seq[String], fold: String => String): String = cols match {
    case Seq(c)    => s"${q(c, fold)} <= ?"
    case c +: rest => s"(${q(c, fold)} < ? OR (${q(c, fold)} = ? AND ${guardSql(rest, fold)}))"
  }

  /** Bind-parameter column sequence matching [[guardSql]]'s ? order. */
  private def guardBindCols(cols: Seq[String]): Seq[String] = cols match {
    case Seq(c)    => Seq(c)
    case c +: rest => Seq(c, c) ++ guardBindCols(rest)
  }

  /** A unique/PK violation specifically — SQLState 23505 (standard,
    * Derby, Postgres) or MySQL's catch-all 23000 with a duplicate/unique
    * message. The broader "class 23" match would also swallow NOT NULL /
    * FK / CHECK violations and silently drop genuinely bad rows.
    */
  private def isUniqueViolation(e: java.sql.SQLException): Boolean = {
    val st = Option(e.getSQLState).getOrElse("")
    val msg = Option(e.getMessage).getOrElse("").toLowerCase
    st == "23505" || (st == "23000" && (msg.contains("unique") || msg.contains("duplicate")))
  }

  def upsert(
      df: DataFrame,
      url: String,
      table: String,
      keys: Seq[String],
      opCol: Option[String] = None,
      deleteOp: String = "d",
      ordCols: Seq[String] = Seq.empty
  ): Unit = {
    val schema = df.schema
    val dataCols = schema.fieldNames.toSeq.filterNot(c => keys.contains(c) || opCol.contains(c))
    require(dataCols.nonEmpty,
      s"upsert into $table needs at least one non-key payload column " +
        s"(got keys=$keys, op=$opCol only) — a keys-only feed has nothing to SET")
    val allCols = keys ++ dataCols
    val fold = foldCase(url)
    val guard = if (ordCols.nonEmpty) s" AND ${guardSql(ordCols, fold)}" else ""
    val guardCols = if (ordCols.nonEmpty) guardBindCols(ordCols) else Seq.empty
    val updateSql = s"UPDATE ${qTable(table, fold)} SET ${dataCols.map(c => s"${q(c, fold)} = ?").mkString(", ")} " +
      s"WHERE ${keys.map(c => s"${q(c, fold)} = ?").mkString(" AND ")}$guard"
    val insertSql = s"INSERT INTO ${qTable(table, fold)} (${allCols.map(q(_, fold)).mkString(", ")}) " +
      s"VALUES (${allCols.map(_ => "?").mkString(", ")})"
    val deleteSql =
      s"DELETE FROM ${qTable(table, fold)} WHERE ${keys.map(c => s"${q(c, fold)} = ?").mkString(" AND ")}$guard"
    val idx = schema.fieldNames.zipWithIndex.toMap
    val types = schema.fields.map(f => f.name -> jdbcType(f.dataType)).toMap
    df.foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
      val conn = java.sql.DriverManager.getConnection(url)
      try {
        conn.setAutoCommit(false) // inside try: a broken connection here must still close()
        val up = conn.prepareStatement(updateSql)
        val ins = conn.prepareStatement(insertSql)
        val del = conn.prepareStatement(deleteSql)
        def bind(st: java.sql.PreparedStatement, row: org.apache.spark.sql.Row,
            cols: Seq[String], offset: Int = 0): Int = {
          cols.zipWithIndex.foreach { case (c, i) =>
            val v = row.get(idx(c))
            // typed null binding: the JDBC spec leaves untyped
            // setObject(i, null) driver-dependent (Oracle rejects it);
            // setNull with the declared type is the portable form
            if (v == null) st.setNull(offset + i + 1, types(c))
            else st.setObject(offset + i + 1, v)
          }
          offset + cols.length
        }
        rows.foreach { row =>
          // a NULL ordering value is unorderable: every guard comparison
          // against it is UNKNOWN, so the UPDATE matches nothing, the
          // fallback INSERT hits the PK, and the swallow path would
          // silently discard the row's data — fail loudly instead
          ordCols.foreach { c =>
            if (row.get(idx(c)) == null) throw new IllegalArgumentException(
              s"row for $table has NULL ordering column '$c' — unorderable " +
                "against the last-write-wins guard; fix or filter the feed")
          }
          val isDelete = opCol.exists(c => row.getAs[String](c) == deleteOp)
          if (isDelete) {
            val n = bind(del, row, keys)
            bind(del, row, guardCols, n)
            del.executeUpdate()
          } else {
            val n = bind(up, row, keys, bind(up, row, dataCols))
            bind(up, row, guardCols, n)
            if (up.executeUpdate() == 0) {
              bind(ins, row, allCols)
              // savepoint around the guarded INSERT: on PostgreSQL any
              // statement error ABORTS the whole transaction (every
              // later statement and the commit fail with 25P02), so
              // swallowing the PK violation without one turns a single
              // stale redelivery into a permanently poisoned,
              // endlessly-retried task
              val sp = if (ordCols.nonEmpty) conn.setSavepoint() else null
              try {
                ins.executeUpdate()
                if (sp != null) conn.releaseSavepoint(sp)
              } catch {
                // PK collision with a NEWER row (the guard blocked the
                // update): stale redelivery, skip. Without ordCols there
                // is no guard, so collisions are genuine errors — and
                // ONLY unique violations are ever swallowed (a NOT NULL /
                // FK / CHECK failure is a bad row, not a redelivery).
                case e: java.sql.SQLException if isUniqueViolation(e) =>
                  if (ordCols.isEmpty) throw e
                  conn.rollback(sp)
              }
            }
          }
        }
        conn.commit()
      } catch {
        case e: Throwable =>
          // rollback on a dead connection can itself throw — never let it
          // mask the root cause
          try conn.rollback()
          catch { case r: Throwable => e.addSuppressed(r) }
          throw e
      } finally conn.close()
    }
  }

  /** Streaming delivery: per micro-batch, reduce the delta to
    * latest-per-key (ordering settled before rows fan out over
    * partitions) and upsert it — the reference's end-to-end
    * OLR→Kafka→JDBC-sink path as one `foreachBatch`. Idempotent under
    * redelivery: re-upserting the same latest-per-key rows rewrites the
    * same values.
    */
  def upsertStream(
      feed: DataFrame,
      url: String,
      table: String,
      keys: Seq[String],
      ordering: Seq[String],
      checkpointDir: String,
      opCol: String = "op",
      trigger: Trigger = Trigger.AvailableNow()
  ): StreamingQuery = {
    ensureTable(url, table,
      StructType(feed.schema.filterNot(_.name == opCol)), keys)
    feed.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val latest = graft.cdc.Ops.latestPerKey(batch, keys, ordering)
        // the cross-batch guard uses the FULL composite ordering — the
        // head column alone would let a redelivery tying on it regress
        // the sink
        upsert(latest, url, table, keys, opCol = Some(opCol), ordCols = ordering)
        ()
      }
      .start()
  }
}
