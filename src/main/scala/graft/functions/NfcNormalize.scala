package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for Unicode NFC normalization (SURVEY.md
  * §2.11: custom `Expression` surface; §2.12 text-curation family).
  *
  * Why an Expression and not a UDF: normalization runs over EVERY
  * document of a 100 TB corpus before fingerprinting/dedup — a Scala UDF
  * would break whole-stage codegen and pay serialization per row; this
  * stays inside the generated loop and calls straight into the JDK's
  * `java.text.Normalizer` (zero dependencies).
  *
  * Semantics: canonical composition (NFC) of the input string, the
  * canonical pre-tokenization step for text pipelines — "e" + U+0301
  * combining acute becomes the single codepoint "é", so the same visible
  * text always hashes/shingles identically regardless of how it was
  * encoded upstream. Pure NFC, no case folding or whitespace edits:
  * bit-compatible with DuckDB's `nfc_normalize`, which is the oracle for
  * `text_normalize` (CurationSpec pins composition cases the ASCII-only
  * synthetic corpus can't exercise).
  *
  * Fast path: `Normalizer.isNormalized` is O(n) with no allocation and
  * true for ~all real-world text (and all ASCII); only strings that
  * actually contain decomposed sequences pay the normalize+copy. The
  * UTF8String→String→UTF8String round-trip is unavoidable — the JDK
  * normalizer works on UTF-16 — but is only paid on the slow path.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string argument, got ${other.simpleString}")
  }

  override def dataType: DataType = StringType

  override def prettyName: String = "nfc_normalize"

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalize.normalize($c)")
}

object NfcNormalize {

  /** Shared by interpreted eval and generated code (the codegen template
    * calls this static-forwarder directly — the logic lives once).
    */
  def normalize(s: UTF8String): UTF8String = {
    // true zero-allocation fast path: pure-ASCII text is NFC by
    // definition, and isFullAscii is a byte scan on the UTF8String
    // itself — the previous code paid the UTF-8 → UTF-16 decode
    // (s.toString) on EVERY row before asking isNormalized, exactly the
    // per-row allocation the scaladoc claimed this path avoided
    if (s.isFullAscii) s
    else {
      val str = s.toString
      if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
      else UTF8String.fromString(
        java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
    }
  }

  val functionName = "nfc_normalize"

  private[functions] val info =
    new ExpressionInfo(classOf[NfcNormalize].getName, functionName)

  private[functions] def builder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 1, s"$functionName expects 1 argument")
    NfcNormalize(exprs.head)
  }

  /** Idempotently register in a session's function registry (sessions the
    * engine didn't build, e.g. the driver's Verify/Bench sessions).
    */
  def ensureRegistered(spark: SparkSession): Unit =
    Registration.ensure(spark, functionName, info, builder _)

  /** Column-API form (after ensureRegistered / extensions injection). */
  def nfc_normalize(c: Column): Column = call_function(functionName, c)
}
