package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.call_function

/** Native Catalyst expression for cosine similarity over two
  * `array<float>` columns (SURVEY.md §2.11/§4: custom `Expression` with
  * `doGenCode` where the built-in surface is too slow — the `zip_with` +
  * `aggregate` formulation allocates an intermediate array and walks the
  * interpreted higher-order-function path per row; this compiles to a
  * single fused primitive loop inside whole-stage codegen).
  *
  * Accumulation is double, in array order — bit-identical to the
  * higher-order formulation it replaces (asserted in SimilaritySpec).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(e => e.dataType match {
      case ArrayType(FloatType, _) => true
      case _                       => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects two array<float> arguments, " +
        s"got ${left.dataType.simpleString} / ${right.dataType.simpleString}")
  }

  override def dataType: DataType = DoubleType

  // null on length mismatch (below), independent of child nullability
  override def nullable: Boolean = true

  override def prettyName: String = "cosine_sim"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    // mismatched lengths → null, matching the zip_with/aggregate HOF
    // formulation (its null-padded tail poisons the sum to null)
    if (x.numElements() != y.numElements()) null
    else {
      val n = x.numElements()
      var dot = 0.0; var nx = 0.0; var ny = 0.0
      var i = 0
      while (i < n) {
        // a null ELEMENT nulls the whole result, exactly like the HOF
        // form (null product poisons the aggregate); ArrayData.getFloat
        // on a null slot would silently read 0.0 and emit a wrong
        // non-null similarity
        if (x.isNullAt(i) || y.isNullAt(i)) return null
        val u = x.getFloat(i).toDouble
        val v = y.getFloat(i).toDouble
        dot += u * v; nx += u * u; ny += v * v
        i += 1
      }
      dot / math.sqrt(nx) / math.sqrt(ny)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val u = ctx.freshName("u")
      val v = ctx.freshName("v")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    double $u = (double) $a.getFloat($i);
         |    double $v = (double) $b.getFloat($i);
         |    $dot += $u * $v; $nx += $u * $u; $ny += $v * $v;
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $dot / java.lang.Math.sqrt($nx) / java.lang.Math.sqrt($ny);
         |  }
         |}
       """.stripMargin
    })
}

object CosineSimilarity {

  val functionName = "cosine_sim"

  private[functions] val info = new ExpressionInfo(classOf[CosineSimilarity].getName, functionName)

  private[functions] def builder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2, s"$functionName expects 2 arguments")
    CosineSimilarity(exprs.head, exprs(1))
  }

  /** Idempotently register in a session's function registry (sessions the
    * engine didn't build, e.g. the driver's Verify/Bench sessions).
    */
  def ensureRegistered(spark: SparkSession): Unit =
    Registration.ensure(spark, functionName, info, builder _)

  /** Column-API form (after ensureRegistered / extensions injection). */
  def cosine_sim(a: Column, b: Column): Column = call_function(functionName, a, b)
}
