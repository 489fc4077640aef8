package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge
import org.apache.spark.sql.types._

/** Native Catalyst expression: the id of the max-cosine-similarity cell
  * for a vector against a packed centroid array — the argmax kernel of
  * every cell assignment (IVF coarse quantizer, Lloyd refinement,
  * SemDeDup clustering).
  *
  * Input: (v: array<double>, es: array<struct<cell: int, cv:
  * array<double>>>). Output: the `cell` of the entry with the highest
  * cosine(v, cv); ties break to the LOWEST cell id — exactly the
  * `orderBy(desc(d), asc(cell))` / `array_max(struct(d, -cell))` rule
  * of the forms it replaces. Entries whose cosine is undefined (length
  * mismatch, zero norm) are skipped; null if no entry scores.
  *
  * Why native (the [[CosineSimilarity]]/[[GramDigests]] argument, one
  * level up): the composable `transform(es, e -> struct(cosine, -cell))
  * + array_max` walks the higher-order-function interpreter per
  * centroid entry and allocates a struct per (row, entry) — at the
  * 100k-vector × 256-cell scale fixture that is 25.6M struct
  * allocations and ~1.6G interpreted double ops per assignment pass,
  * which made the pass the dominant cost of q_ann_ivfpq_scale. This
  * expression runs the whole argmax as one fused primitive loop
  * (cosine arithmetic copied verbatim from [[CosineSimilarity]], so
  * selection is bit-identical).
  */
/** `l2 = true` switches the metric to MINIMUM squared Euclidean
  * distance (sequential left fold of (x−y)², mirroring the
  * `aggregate(zip_with(...))` chain of the pqAssign form it replaces;
  * ties to the lowest cell) — the PQ codebook-assignment kernel.
  */
case class NearestCell(left: Expression, right: Expression, l2: Boolean)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val vOk = left.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    val esOk = right.dataType match {
      case ArrayType(StructType(Array(
        StructField(_, IntegerType, _, _),
        StructField(_, ArrayType(DoubleType, _), _, _))), _) => true
      case _ => false
    }
    if (vOk && esOk) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "nearest_cell expects (array<double>, array<struct<int, array<double>>>), " +
        s"got (${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true

  override def nullSafeEval(l: Any, r: Any): Any =
    NearestCell.compute(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData], l2)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, es) => {
      val r = ctx.freshName("r")
      s"""
         |java.lang.Integer $r = graft.functions.NearestCell.compute($v, $es, $l2);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r.intValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object NearestCell {
  /** Column API over (array<double>, array<struct<cell, cv>>) columns. */
  def apply(v: Column, es: Column): Column =
    graftbridge.toColumn(NearestCell(
      graftbridge.toExpression(v), graftbridge.toExpression(es), false))

  /** Min-squared-distance variant (the PQ codebook assignment). */
  def l2(v: Column, es: Column): Column =
    graftbridge.toColumn(NearestCell(
      graftbridge.toExpression(v), graftbridge.toExpression(es), true))

  /** Fused argmax/argmin; called from both interpreted eval and the
    * generated code. Cosine arithmetic mirrors
    * CosineSimilarity.nullSafeEval exactly (sequential left fold,
    * nulls-as-0, null on zero norm); L2 mirrors the
    * aggregate(zip_with((x−y)²)) fold.
    */
  def compute(v: ArrayData, es: ArrayData, l2: Boolean): java.lang.Integer = {
    val n = v.numElements()
    val m = es.numElements()
    var bestCell = 0
    var bestD = 0.0
    var found = false
    var j = 0
    while (j < m) {
      // the input array type may carry containsNull=true; a null entry
      // scores nothing (the composed transform+array_max form this
      // replaces skipped nulls the same way)
      if (!es.isNullAt(j)) {
        val row = es.getStruct(j, 2)
        val cell = row.getInt(0)
        val cv = row.getArray(1)
        if (cv.numElements() == n) {
          if (l2) {
            var d = 0.0
            var i = 0
            while (i < n) {
              val x = if (v.isNullAt(i)) 0.0 else v.getDouble(i)
              val y = if (cv.isNullAt(i)) 0.0 else cv.getDouble(i)
              val z = x - y
              d += z * z
              i += 1
            }
            if (!found || d < bestD || (d == bestD && cell < bestCell)) {
              bestD = d; bestCell = cell; found = true
            }
          } else {
            var dot = 0.0; var na = 0.0; var nb = 0.0
            var i = 0
            while (i < n) {
              val x = if (v.isNullAt(i)) 0.0 else v.getDouble(i)
              val y = if (cv.isNullAt(i)) 0.0 else cv.getDouble(i)
              dot += x * y; na += x * x; nb += y * y
              i += 1
            }
            if (na != 0.0 && nb != 0.0) {
              val d = dot / (java.lang.Math.sqrt(na) * java.lang.Math.sqrt(nb))
              if (!found || d > bestD || (d == bestD && cell < bestCell)) {
                bestD = d; bestCell = cell; found = true
              }
            }
          }
        }
      }
      j += 1
    }
    if (found) java.lang.Integer.valueOf(bestCell) else null
  }
}
