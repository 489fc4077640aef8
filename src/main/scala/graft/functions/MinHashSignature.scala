package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge
import org.apache.spark.sql.types._

/** Native Catalyst expression: all `numPerms` min-hash signature values
  * of a hashed-token set in ONE fused pass.
  *
  * The composable form — `numPerms` × `array_min(transform(toks, h =>
  * xxhash64(lit(i), h)))` — materializes an intermediate array per perm
  * per row and walks the token array `numPerms` times through the
  * higher-order-function interpreter; at 64 perms that made the
  * signature stage ~2.6× the cost of the whole near-dup family. This
  * expression keeps one `long[numPerms]` of running minima and visits
  * each token once, applying a splitmix64 finalizer to (token ⊕ seedᵢ) —
  * an independent-per-perm statistical mix, same role as the
  * seed-prefixed xxhash64 chain it replaces (the banding contract only
  * needs per-perm independence, not a specific hash family).
  *
  * Null/edge semantics: null input → null; null ELEMENTS are skipped
  * (hashedToks never produces them); an empty set yields Long.MaxValue
  * minima (deterministic, and two empty sets still collide — jac 1).
  */
case class MinHashSignature(child: Expression, numPerms: Int)
    extends UnaryExpression {

  require(numPerms > 0)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"minhash_signature expects array<bigint>, got ${dt.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  // Golden-ratio-stepped seeds + splitmix64 finalizer (public-domain
  // mixing constants; Steele et al., "Fast Splittable Pseudorandom
  // Number Generators").
  override def nullSafeEval(v: Any): Any = {
    val toks = v.asInstanceOf[ArrayData]
    val mins = Array.fill(numPerms)(Long.MaxValue)
    var i = 0
    val n = toks.numElements()
    while (i < n) {
      if (!toks.isNullAt(i)) {
        val h = toks.getLong(i)
        var p = 0
        while (p < numPerms) {
          var z = h ^ (0x9E3779B97F4A7C15L * (p + 1))
          z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
          z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
          z = z ^ (z >>> 31)
          if (z < mins(p)) mins(p) = z
          p += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val mins = ctx.freshName("mins")
      val i = ctx.freshName("i")
      val p = ctx.freshName("p")
      val n = ctx.freshName("n")
      val h = ctx.freshName("h")
      val z = ctx.freshName("z")
      s"""
         |final long[] $mins = new long[$numPerms];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |final int $n = $a.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i)) {
         |    final long $h = $a.getLong($i);
         |    for (int $p = 0; $p < $numPerms; $p++) {
         |      long $z = $h ^ (0x9E3779B97F4A7C15L * ($p + 1));
         |      $z = ($z ^ ($z >>> 30)) * 0xBF58476D1CE4E5B9L;
         |      $z = ($z ^ ($z >>> 27)) * 0x94D049BB133111EBL;
         |      $z = $z ^ ($z >>> 31);
         |      if ($z < $mins[$p]) $mins[$p] = $z;
         |    }
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSignature {
  /** Column API: fixed-width minhash signature of an array<long> column. */
  def apply(toks: Column, numPerms: Int): Column =
    graftbridge.toColumn(
      MinHashSignature(graftbridge.toExpression(toks), numPerms))
}
