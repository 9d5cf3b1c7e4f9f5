package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: DEFLATE-compressed size of a string's
  * UTF-8 bytes (SURVEY.md §2.11 custom-`Expression` surface; §2.12
  * text-curation family).
  *
  * The compression-ratio quality heuristic (CCNet/Gopher-adjacent,
  * standard in modern corpus pipelines): pathological text compresses
  * too WELL (template spam, repeated spans — ratio ≪ normal prose) or
  * too BADLY (base64/binary junk — ratio ≈ 1), so compressed/raw is a
  * cheap model-free quality gate that catches degeneracies n-gram
  * statistics miss. DuckDB has no deflate function, so the query id
  * riding this is rows-only with planted-corpus specs.
  *
  * Why an Expression and not a UDF: the signal runs over every document
  * of a 100 TB corpus; this stays inside whole-stage codegen and calls
  * straight into the JDK's zlib binding (`java.util.zip.Deflater`, zero
  * dependencies). The Deflater is native-heap-backed and expensive to
  * construct, so each executor thread reuses ONE instance via
  * ThreadLocal (`reset()` per row — the documented reuse pattern), and
  * the scratch output buffer is likewise per-thread: zero per-row
  * allocation beyond the UTF-8 byte copy Spark's own string accessors
  * make.
  *
  * Deterministic for a given input on a given JDK (fixed level 6, no
  * preset dictionary); the spec asserts ORDERING properties (repetitive
  * < prose < high-entropy), never absolute sizes, so JDK zlib updates
  * cannot break it.
  */
case class DeflateSize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string argument, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "deflate_size"

  override protected def withNewChildInternal(newChild: Expression): DeflateSize =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any =
    DeflateSize.size(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.DeflateSize.size($c)")
}

object DeflateSize {

  private val deflaterLocal: ThreadLocal[java.util.zip.Deflater] =
    ThreadLocal.withInitial(() =>
      new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION, false))

  private val scratchLocal: ThreadLocal[Array[Byte]] =
    ThreadLocal.withInitial(() => new Array[Byte](8192))

  /** Shared by interpreted eval and generated code (static forwarder —
    * the logic lives once, same pattern as [[NfcNormalize.normalize]]).
    */
  def size(s: UTF8String): Long = {
    val d = deflaterLocal.get()
    d.reset()
    d.setInput(s.getBytes)
    d.finish()
    val scratch = scratchLocal.get()
    var total = 0L
    while (!d.finished()) total += d.deflate(scratch)
    // release the input reference: without this the idle pool thread
    // pins the LAST document's byte copy (multi-MB for large docs)
    // until its next call
    d.reset()
    d.setInput(DeflateSize.empty)
    total
  }

  private val empty = new Array[Byte](0)

  val functionName = "deflate_size"

  private[functions] val info =
    new ExpressionInfo(classOf[DeflateSize].getName, functionName)

  private[functions] def builder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 1, s"$functionName expects 1 argument")
    DeflateSize(exprs.head)
  }

  /** Idempotently register in a session's function registry (sessions the
    * engine didn't build, e.g. the driver's Verify/Bench sessions).
    */
  def ensureRegistered(spark: SparkSession): Unit =
    Registration.ensure(spark, functionName, info, builder _)

  /** Column-API form (after ensureRegistered / extensions injection). */
  def deflate_size(c: Column): Column = call_function(functionName, c)
}
