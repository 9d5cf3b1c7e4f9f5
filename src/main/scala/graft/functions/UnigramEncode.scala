package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unigram-LM Viterbi segmentation of ONE word in one native eval
  * (round 17 — the SentencePiece decoding rule, Kudo 2018 §3): choose
  * the segmentation maximizing Π p(piece), i.e. minimizing
  * Σ logp_e9(piece) where logp_e9 = round(10⁹·ln(T/f)) is the
  * QUANTIZED integer negative log-probability. The quantization is the
  * round-16 exactness discipline applied to a probabilistic decoder:
  * once the model ships as integer costs, the DP is EXACT integer
  * arithmetic with the deterministic tie-break (cost, n_pieces,
  * path-bytes), so both engines pick the identical segmentation — no
  * IEEE comparison exists on the decode path (ln runs once per piece
  * at model build and rides into the oracle as a literal, the
  * merge-embedding idiom).
  *
  * The vocab literal is an array<string> of `lp`␞`piece` packed
  * entries (chr(30) cannot appear in corpus tokens — the Bpe separator
  * contract; a violation desyncs loudly, never falsely passes). Pieces
  * are 1..4 code points; matching advances by code points. Words
  * longer than [[UnigramEncode.MaxWordCp]] code points segment as the
  * single pseudo-token '[LONG]' (cost 0) in BOTH engines — the bound
  * that keeps the oracle's unrolled DP finite. A word with no
  * reachable segmentation (a code point absent from the model) is
  * '[UNK]' (cost 0); same-corpus encodes never hit it because every
  * single char is in the vocab by construction.
  *
  * Output: struct(toks array<string>, n_tokens long, cost_e9 long).
  */
case class UnigramEncode(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (StringType, ArrayType(StringType, _)) if right.foldable =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (string, foldable array<string> of packed lp/piece), " +
        s"got ${l.simpleString} / ${r.simpleString}")
  }

  override def dataType: DataType = UnigramEncode.outputType

  override def nullable: Boolean = true

  override def prettyName: String = UnigramEncode.functionName

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): UnigramEncode =
    copy(left = newLeft, right = newRight)

  @transient private lazy val lpOf: java.util.HashMap[String, java.lang.Long] = {
    val arr = right.eval(null).asInstanceOf[ArrayData]
    val m = new java.util.HashMap[String, java.lang.Long](arr.numElements() * 2)
    var i = 0
    while (i < arr.numElements()) {
      val s = arr.getUTF8String(i).toString
      val cut = s.indexOf('\u001E')
      m.put(s.substring(cut + 1), java.lang.Long.parseLong(s.substring(0, cut)))
      i += 1
    }
    m
  }

  // dp cell; compared by (cost, k, path) with BYTE-lexicographic path
  // order, matching DuckDB's binary VARCHAR collation in the struct sort
  private def better(c1: Long, k1: Long, p1: String,
      c2: Long, k2: Long, p2: String): Boolean =
    c1 < c2 || (c1 == c2 && (k1 < k2 ||
      (k1 == k2 && graft.llm.Bpe.utf8Order.compare(p1, p2) < 0)))

  override def nullSafeEval(wordAny: Any, vocabAny: Any): Any = {
    val w = wordAny.asInstanceOf[UTF8String].toString
    val cpOff = new java.util.ArrayList[Integer]()
    var ci = 0
    while (ci < w.length) { cpOff.add(ci); ci = w.offsetByCodePoints(ci, 1) }
    cpOff.add(w.length)
    val n = cpOff.size() - 1
    if (n == 0)
      return InternalRow(new GenericArrayData(Array.empty[Any]), 0L, 0L)
    if (n > UnigramEncode.MaxWordCp)
      return InternalRow(
        new GenericArrayData(Array[Any](UTF8String.fromString("[LONG]"))), 1L, 0L)
    val cost = new Array[Long](n + 1)
    val kcnt = new Array[Long](n + 1)
    val path = new Array[String](n + 1)
    java.util.Arrays.fill(cost, Long.MaxValue)
    cost(0) = 0L; kcnt(0) = 0L; path(0) = ""
    var k = 1
    while (k <= n) {
      var j = 1
      while (j <= 4 && j <= k) {
        if (cost(k - j) != Long.MaxValue) {
          val piece = w.substring(cpOff.get(k - j), cpOff.get(k))
          val lp = lpOf.get(piece)
          if (lp != null) {
            val c2 = cost(k - j) + lp.longValue()
            val k2 = kcnt(k - j) + 1
            val p2 = if (path(k - j).isEmpty) piece else path(k - j) + " " + piece
            if (cost(k) == Long.MaxValue || better(c2, k2, p2, cost(k), kcnt(k), path(k))) {
              cost(k) = c2; kcnt(k) = k2; path(k) = p2
            }
          }
        }
        j += 1
      }
      k += 1
    }
    if (cost(n) == Long.MaxValue)
      return InternalRow(
        new GenericArrayData(Array[Any](UTF8String.fromString("[UNK]"))), 1L, 0L)
    val toks = path(n).split(" ").map(t => UTF8String.fromString(t): Any)
    InternalRow(new GenericArrayData(toks), kcnt(n), cost(n))
  }
}

object UnigramEncode {
  val functionName = "unigram_encode_word"

  /** Oracle-unroll bound: words longer than this many code points are
    * '[LONG]' (fixture max is 8; the salted 25× replica reaches 11).
    */
  val MaxWordCp = 24

  val outputType: StructType = StructType(Seq(
    StructField("toks", ArrayType(StringType, containsNull = false)),
    StructField("n_tokens", LongType),
    StructField("cost_e9", LongType)))

  private[functions] val info =
    new ExpressionInfo(classOf[UnigramEncode].getName, functionName)

  private[functions] def builder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2, s"$functionName expects 2 arguments")
    UnigramEncode(exprs.head, exprs(1))
  }

  def ensureRegistered(spark: SparkSession): Unit =
    Registration.ensure(spark, functionName, info, builder _)

  /** Column-API form (after ensureRegistered / extensions injection). */
  def unigram_encode_word(word: Column, vocab: Column): Column =
    call_function(functionName, word, vocab)
}
