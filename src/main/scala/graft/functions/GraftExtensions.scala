package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: registers graft's native
  * expressions for SQL use. Activate with
  * `spark.sql.extensions=graft.functions.GraftExtensions`, or call
  * [[GraftExtensions.register]] on a live session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.cosineSimDescriptor)
    ext.injectFunction(GraftExtensions.heavyHittersDescriptor)
  }
}

object GraftExtensions {
  private val cosineSimDescriptor = (
    FunctionIdentifier("cosine_sim"),
    new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
    (exprs: Seq[Expression]) => CosineSimilarity(exprs(0), exprs(1)))

  // the analyzer wraps a bare AggregateFunction from the registry in
  // its AggregateExpression, so the builder returns the function. The
  // k argument must be a literal the planner can read at build time —
  // reject anything else with a clean analysis error instead of the
  // opaque runtime exception eval() on an unbound reference throws.
  private val heavyHittersBuilder = (exprs: Seq[Expression]) => {
    import org.apache.spark.sql.catalyst.expressions.Literal
    exprs(1) match {
      case Literal(v: Int, org.apache.spark.sql.types.IntegerType) =>
        HeavyHitters(exprs(0), v)
      case other => throw new org.apache.spark.sql.AnalysisException(
        errorClass = "_LEGACY_ERROR_TEMP_3065",
        messageParameters = Map("clazz" -> "heavy_hitters",
          "msg" -> ("second argument (k) must be an INT literal, got " +
            other.sql)))
    }
  }

  private val heavyHittersDescriptor = (
    FunctionIdentifier("heavy_hitters"),
    new ExpressionInfo(classOf[HeavyHitters].getName, "heavy_hitters"),
    heavyHittersBuilder)

  /** Imperative twin of the extensions hook for already-built sessions. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim",
      exprs => CosineSimilarity(exprs(0), exprs(1)),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "heavy_hitters", heavyHittersBuilder, "built-in")
  }
}
