package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge
import org.apache.spark.sql.types._

/** Native Catalyst expression: cosine similarity of two double arrays.
  *
  * Why a custom Expression instead of the composable
  * `aggregate(zip_with(...))` chain ([[graft.queries.VectorOps.dot]]):
  * the HOF chain allocates an intermediate array per row and evaluates a
  * lambda per element through the interpreter-friendly HigherOrderFunction
  * path; this expression generates a single fused loop via `doGenCode`,
  * keeping ANN scoring inside whole-stage codegen with zero allocation —
  * the difference matters when scoring billions of candidate pairs.
  * Accumulation is a sequential left fold, matching the HOF version and
  * the DuckDB oracle bit-for-bit.
  *
  * Null/edge semantics: null if either side is null, mismatched lengths,
  * or either norm is zero; null elements are treated as 0.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_sim expects (array<double>, array<double>), " +
        s"got (${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    if (a.numElements() != b.numElements()) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    val n = a.numElements()
    while (i < n) {
      val x = if (a.isNullAt(i)) 0.0 else a.getDouble(i)
      val y = if (b.isNullAt(i)) 0.0 else b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) null
    else dot / (java.lang.Math.sqrt(na) * java.lang.Math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    final double $x = $a.isNullAt($i) ? 0.0 : $a.getDouble($i);
         |    final double $y = $b.isNullAt($i) ? 0.0 : $b.getDouble($i);
         |    $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |  }
         |  if ($na == 0.0 || $nb == 0.0) {
         |    ${ev.isNull} = true;
         |  } else {
         |    ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarity {
  /** Column API: `CosineSimilarity(a, b)` over array<double> columns. */
  def apply(a: Column, b: Column): Column =
    graftbridge.toColumn(CosineSimilarity(
      graftbridge.toExpression(a), graftbridge.toExpression(b)))
}
