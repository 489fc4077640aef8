package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the DISTINCT character n-grams of a
  * string in one fused pass, first-occurrence order — the fused twin of
  * `array_distinct(transform(sequence(1, length(s) - (n-1)), i =>
  * substr(s, i, n)))`.
  *
  * That composed form is a CodegenFallback higher-order-function chain:
  * per row it materializes the index sequence, an L-element gram array,
  * and then the distinct pass — all through the expression interpreter.
  * For the trigram queries (q_lang_id's profile training AND
  * classification scans) that chain was ~double the query's cost. Here
  * each gram is sliced once from a code-point array (matching `substr`'s
  * character — not UTF-16 code-unit — semantics) and deduped in one
  * LinkedHashSet; the expression stays inside whole-stage codegen via a
  * static-method call.
  *
  * Null/edge semantics: null → null; text shorter than n code points →
  * empty array (same as the composed form, whose sequence(1, len-(n-1))
  * is empty when the upper bound is < 1 ... with step semantics yielding
  * a descending sequence guarded by the callers' length filter — callers
  * need no filter with this expression).
  */
case class CharNGrams(child: Expression, n: Int) extends UnaryExpression {

  require(n > 0)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"char_ngrams expects string, got ${dt.simpleString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(v: Any): Any =
    CharNGrams.compute(v.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.CharNGrams.compute($t, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharNGrams {
  /** Column API: distinct char n-grams of a string column. */
  def apply(text: Column, n: Int): Column =
    graftbridge.toColumn(CharNGrams(graftbridge.toExpression(text), n))

  def compute(text: UTF8String, n: Int): GenericArrayData = {
    val cp = text.toString.codePoints().toArray
    val nGrams = cp.length - n + 1
    if (nGrams <= 0) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var i = 0
    while (i < nGrams) {
      seen.add(UTF8String.fromString(new String(cp, i, n)))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new GenericArrayData(out)
  }
}
