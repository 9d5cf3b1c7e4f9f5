package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Expression, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}

/** Custom whole-operator extension (SURVEY.md §7.4 M5; builder-prompt
  * tier (c)): a native AS-OF JOIN as LogicalPlan + Strategy + physical
  * merge-scan, injected via `SparkSessionExtensions`.
  *
  * Physical algorithm: both children are hash-clustered on the key with
  * a FIXED partition count (so AQE cannot coalesce the two sides
  * differently) and sorted by (key, ts, tiebreak). One synchronized
  * forward scan per partition pairs each left row with the latest
  * right row at-or-before its timestamp: O(|l|+|r|) work, zero
  * intermediate materialization — the plan shape the union+window
  * formulation (`cdc.Ops.asOfJoin`) approximates with two extra
  * projections and a window buffer.
  *
  * Semantics are INNER: a left row with no at-or-before match — or with
  * a null key/timestamp — is dropped, exactly like the composed twin
  * (enrichment callers wanting left-outer behavior should anti-join the
  * result back against the left side for the unmatched rows).
  */
case class AsOfJoinNode(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTs: Expression,
    rightTs: Expression,
    rightTieBreak: Seq[Expression],
    rightPayload: Seq[Attribute]
) extends BinaryNode {
  // the merge scan compares key-vs-key and ts-vs-ts with ONE ordering
  // built from the LEFT types (AsOfJoinExec), so mismatched right types
  // would ClassCastException deep inside an executor task (or worse,
  // compare wrong for representation-compatible types) — reject at plan
  // construction instead. DataFrame-API callers cast explicitly; the
  // union+window twin (cdc.Ops.asOfJoin) casts rightTs for the same reason.
  require(leftKey.dataType == rightKey.dataType,
    s"as-of join key types differ: ${leftKey.dataType} vs ${rightKey.dataType}")
  require(leftTs.dataType == rightTs.dataType,
    s"as-of join timestamp types differ: ${leftTs.dataType} vs ${rightTs.dataType}")
  // float keys are rejected: NormalizeFloatingNumbers only rewrites the
  // built-in JOIN/WINDOW patterns, so -0.0 vs 0.0 (and NaN bit variants)
  // would hash to different partitions here and silently drop matches a
  // SQL join (where -0.0 = 0.0) emits. No sane as-of key is a float;
  // callers with one must cast or normalize explicitly.
  require(!Seq(org.apache.spark.sql.types.FloatType,
      org.apache.spark.sql.types.DoubleType).contains(leftKey.dataType),
    s"as-of join on a ${leftKey.dataType} key is not supported " +
      "(-0.0/0.0 and NaN bit-patterns would split partitions); cast the key")
  override def output: Seq[Attribute] = left.output ++ rightPayload
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

class AsOfJoinStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, rk, lt, rt, tie, payload) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, tie, payload) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTs: Expression,
    rightTs: Expression,
    rightTieBreak: Seq[Expression],
    rightPayload: Seq[Attribute]
) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ rightPayload

  // fixed partition count: keeps the two shuffles co-partitioned even
  // under AQE (coalescing is skipped when the distribution mandates N)
  override def requiredChildDistribution: Seq[Distribution] = Seq(
    ClusteredDistribution(Seq(leftKey), requiredNumPartitions = Some(conf.numShufflePartitions)),
    ClusteredDistribution(Seq(rightKey), requiredNumPartitions = Some(conf.numShufflePartitions)))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, org.apache.spark.sql.catalyst.expressions.Ascending),
      SortOrder(leftTs, org.apache.spark.sql.catalyst.expressions.Ascending)),
    (Seq(rightKey, rightTs) ++ rightTieBreak).map(e =>
      SortOrder(e, org.apache.spark.sql.catalyst.expressions.Ascending)))

  // the merge scan consumes the left child one-to-one per partition, so
  // its clustering and (key, ts) sort order survive to the output —
  // without these overrides the default UnknownPartitioning forces a
  // redundant re-shuffle in the common asOf-then-aggregate-on-key shape
  override def outputPartitioning: org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val lKeyB = BindReferences.bindReference(leftKey, left.output)
    val lTsB = BindReferences.bindReference(leftTs, left.output)
    val rKeyB = BindReferences.bindReference(rightKey, right.output)
    val rTsB = BindReferences.bindReference(rightTs, right.output)
    val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val tsOrd = TypeUtils.getInterpretedOrdering(leftTs.dataType)
    val payloadExprs = rightPayload
    val rightOutput = right.output
    val outAttrs = output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val payloadProj = UnsafeProjection.create(payloadExprs, rightOutput)
      val resultProj = UnsafeProjection.create(outAttrs, outAttrs)
      val joined = new JoinedRow
      val rBuf = rIter.buffered
      // latest right row seen for the CURRENT key run
      var heldKey: Any = null
      var held: InternalRow = null

      lIter.flatMap { lRow =>
        val lk = lKeyB.eval(lRow)
        val lt = lTsB.eval(lRow)
        if (lk == null || lt == null) Iterator.empty
        else {
          // drop the held row if it belongs to an earlier key
          if (held != null && keyOrd.compare(heldKey, lk) != 0) { held = null }
          // advance right up to (key, ts) <= (lk, lt)
          var advancing = true
          while (advancing && rBuf.hasNext) {
            val rk = rKeyB.eval(rBuf.head)
            val rt = rTsB.eval(rBuf.head)
            if (rk == null || rt == null) { rBuf.next() }
            else {
              val kc = keyOrd.compare(rk, lk)
              if (kc < 0) { rBuf.next() } // key before ours: skip (held reset above)
              else if (kc == 0 && tsOrd.compare(rt, lt) <= 0) {
                held = payloadProj(rBuf.next()).copy() // candidate; later rows may replace
                // deep-copy: for non-primitive keys rk may point into the
                // consumed row's reused buffer
                heldKey = InternalRow.copyValue(rk)
              } else advancing = false
            }
          }
          if (held != null && keyOrd.compare(heldKey, lk) == 0)
            Iterator.single(resultProj(joined(lRow, held)))
          else Iterator.empty
        }
      }
    }
  }
}

/** User-facing constructor: builds the custom logical node from two
  * analyzed DataFrames (attributes already resolved).
  */
object AsOfJoinPlan {
  def asOf(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTs: String,
      rightTs: String,
      rightPayload: Seq[String],
      rightTieBreak: Seq[String] = Seq.empty
  ): DataFrame = {
    val spark = left.sparkSession
    GraftStrategyRegistrar.ensure(spark)
    val lPlan = left.queryExecution.analyzed
    // resolve names with the session's resolver (case-insensitive by
    // default), matching DataFrame column resolution everywhere else —
    // but FAIL on ambiguity like the analyzer does: a silent
    // first-match pick (e.g. columns 'TS' and 'ts' both present) would
    // join against the wrong column with no error
    val resolver = spark.sessionState.conf.resolver
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.filter(a => resolver(a.name, n)) match {
        case Seq(one) => one
        case Seq()    => sys.error(s"no column $n")
        case many     => sys.error(
          s"ambiguous column $n: matches ${many.map(_.name).mkString(", ")}")
      }
    // ALWAYS re-alias the right side: a self (or shared-lineage) as-of
    // join carries the same exprIds on both children, and downstream
    // attribute binding resolves each id to its FIRST occurrence — the
    // left position — silently substituting the left row's own values
    // for the matched right payload. Alias the ANALYZED plan's output
    // attributes directly (not a by-name right(c) round-trip, which
    // throws on duplicate names and mis-resolves dotted ones), and
    // prune to the referenced columns while at it: ColumnPruning cannot
    // see through the custom node, so an unpruned right side would
    // shuffle and sort every column for a 1-payload join.
    val rAnalyzed = right.queryExecution.analyzed
    val rNeededIdx = (Seq(rightKey, rightTs) ++ rightTieBreak ++ rightPayload)
      .map(n => rAnalyzed.output.indexOf(attr(rAnalyzed, n))).distinct.sorted
    val rPlan = org.apache.spark.sql.catalyst.plans.logical.Project(
      rNeededIdx.map { i =>
        val a = rAnalyzed.output(i)
        org.apache.spark.sql.catalyst.expressions.Alias(a, a.name)()
      },
      rAnalyzed)
    val node = AsOfJoinNode(
      lPlan, rPlan,
      attr(lPlan, leftKey), attr(rPlan, rightKey),
      attr(lPlan, leftTs), attr(rPlan, rightTs),
      rightTieBreak.map(attr(rPlan, _)),
      rightPayload.map(attr(rPlan, _)))
    org.apache.spark.sql.GraftBridge.ofRows(spark, node)
  }
}

/** Strategy injection: via `SparkSessionExtensions` for sessions built
  * with `spark.sql.extensions=graft.functions.GraftExtensions`, or
  * idempotently at runtime for sessions the driver builds itself.
  */
object GraftStrategyRegistrar {
  def ensure(spark: SparkSession): Unit = synchronized {
    // synchronized: extraStrategies is a bare read-modify-write — two
    // concurrent first asOf() calls could both pass the exists check
    // and register twice. (A conf-built session with GraftExtensions
    // still ends up with one extensions-injected instance plus this
    // one — harmless duplicate planning work on the custom node only,
    // since both strategies no-op on every other plan shape.)
    val ss = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    // experimental.extraStrategies is the public runtime hook the planner
    // consults first; GraftExtensions covers conf-built sessions.
    val em = ss.experimental
    if (!em.extraStrategies.exists(_.isInstanceOf[AsOfJoinStrategy]))
      em.extraStrategies = new AsOfJoinStrategy +: em.extraStrategies
  }
}
