package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.unsafe.types.UTF8String

/** WordPiece greedy longest-match-first tokenization of ONE word in one
  * native eval (round 17 — the BERT-family encode rule, Devlin et al.
  * 2019 §4.1 / Song et al. 2021 "Fast WordPiece Tokenization"): scan
  * left to right, at each position take the LONGEST vocab piece that
  * matches; if no piece matches at any position the WHOLE word becomes
  * `[UNK]` — the standard all-or-nothing rule.
  *
  * The vocab rides as a foldable array<string> literal of TAGGED pieces
  * — '0'+material for word-initial pieces, '1'+material for
  * continuations (graft.llm.WordPiece's internal symbol encoding; the
  * conventional '##' prefix is display-only). Tagging instead of
  * '##'-prefix parsing makes the initial/continuation classification
  * structurally unambiguous even when the corpus itself contains '#'
  * characters (the fixture does). The literal is hashed ONCE per
  * partition into a set + per-class max-piece-length bounds, so each
  * position costs at most maxLen set probes — the loop a HOF chain
  * cannot express without quadratic interpreted re-scans (the vec_pq
  * lesson; [[PqEncodeRecon]] precedent).
  *
  * Output: array of DISPLAY pieces (material, or '##'+material for
  * continuations), or ['[UNK]'] when the word cannot be covered. The
  * DuckDB oracle replays the identical rule as a precomputed
  * longest-match `next` table + a recursive single-successor walk —
  * greedy means ONE successor per position, so the recursion is linear
  * and aggregation-free.
  */
case class WordPieceEncode(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (org.apache.spark.sql.types.StringType,
          org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StringType, _))
        if right.foldable =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (string, foldable array<string> of tagged pieces), " +
        s"got ${l.simpleString} / ${r.simpleString}")
  }

  override def dataType: org.apache.spark.sql.types.DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.StringType, containsNull = false)

  override def nullable: Boolean = true

  override def prettyName: String = WordPieceEncode.functionName

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WordPieceEncode =
    copy(left = newLeft, right = newRight)

  // tagged-piece set + per-class longest material length (code points)
  @transient private lazy val (vocab, maxInitLen, maxContLen) = {
    val arr = right.eval(null).asInstanceOf[ArrayData]
    val s = new java.util.HashSet[String](arr.numElements() * 2)
    var mi = 1
    var mc = 1
    var i = 0
    while (i < arr.numElements()) {
      val p = arr.getUTF8String(i).toString
      s.add(p)
      val cps = p.codePointCount(1, p.length)
      if (p.charAt(0) == '0') mi = math.max(mi, cps) else mc = math.max(mc, cps)
      i += 1
    }
    (s, mi, mc)
  }

  override def nullSafeEval(wordAny: Any, vocabAny: Any): Any = {
    // match over CODE POINTS, not UTF-16 chars: the trainer's symbols
    // are split("") code points, so a surrogate pair is one symbol
    val w = wordAny.asInstanceOf[UTF8String].toString
    val cpOff = new java.util.ArrayList[Integer]()
    var ci = 0
    while (ci < w.length) { cpOff.add(ci); ci = w.offsetByCodePoints(ci, 1) }
    cpOff.add(w.length)
    val ncp = cpOff.size() - 1
    if (ncp == 0) return new GenericArrayData(Array.empty[Any])
    val out = new scala.collection.mutable.ArrayBuffer[Any](ncp)
    var pos = 0
    while (pos < ncp) {
      val tag = if (pos == 0) "0" else "1"
      var len = math.min(if (pos == 0) maxInitLen else maxContLen, ncp - pos)
      var material: String = null
      while (len >= 1 && material == null) {
        val cand = w.substring(cpOff.get(pos), cpOff.get(pos + len))
        if (vocab.contains(tag + cand)) material = cand
        len -= 1
      }
      if (material == null)
        return new GenericArrayData(Array[Any](UTF8String.fromString("[UNK]")))
      out += UTF8String.fromString(if (pos == 0) material else "##" + material)
      pos += material.codePointCount(0, material.length)
    }
    new GenericArrayData(out.toArray)
  }
}

object WordPieceEncode {
  val functionName = "wordpiece_encode_word"

  private[functions] val info =
    new ExpressionInfo(classOf[WordPieceEncode].getName, functionName)

  private[functions] def builder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2, s"$functionName expects 2 arguments")
    WordPieceEncode(exprs.head, exprs(1))
  }

  def ensureRegistered(spark: SparkSession): Unit =
    Registration.ensure(spark, functionName, info, builder _)

  /** Column-API form (after ensureRegistered / extensions injection). */
  def wordpiece_encode_word(word: Column, vocab: Column): Column =
    call_function(functionName, word, vocab)
}
