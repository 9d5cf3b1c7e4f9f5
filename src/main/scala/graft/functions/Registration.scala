package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** The ONE runtime-registration path for the engine's native functions
  * — each companion's `ensureRegistered` delegates here (a divergent
  * re-implementation of this block already caused a real arity bug
  * once, see the GraftExtensions builder note).
  */
private[functions] object Registration {

  /** Register iff absent: the registry's registerFunction REPLACES and
    * warns on every call, so the per-operation ensureRegistered calls
    * sprinkled through VectorOps/TextOps would otherwise log a replace
    * warning per query and rewrite the entry for nothing.
    */
  def ensure(spark: SparkSession, name: String, info: ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit = {
    val id = FunctionIdentifier(name)
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(id)) reg.registerFunction(id, info, builder)
  }
}
