package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the winnowing fingerprint set
  * (Schleimer/Wilkerson/Aiken 2003) of a document in ONE fused pass —
  * the distinct md5-hex minima of each `w`-gram window over the char
  * `k`-gram hashes of the text.
  *
  * The composable form — `transform(sequence, i => md5(substr))` to
  * stage the gram hashes, then `transform(sequence, j =>
  * array_min(slice(grams, j, w)))` for the window minima — walks the
  * higher-order-function interpreter twice per document and allocates a
  * fresh w-element slice per window position: ~O(L·w) string compares
  * plus ~L intermediate arrays per doc, which made q_winnow_fp the
  * slowest registry entry (9.3 s at sf0.1 for ~1.5M grams). This
  * expression hashes each gram once and takes the window minima with a
  * monotonic deque — amortized O(1) per position, O(L) total — and only
  * hex-encodes the selected distinct minima (~2L/(w+1) per doc in
  * expectation).
  *
  * Bit-parity with the composed form (and the DuckDB oracle twin): the
  * minimum is selected by UNSIGNED byte order on the raw 16-byte md5
  * digest, which equals lexicographic order on the lowercase-hex string
  * because the nibble→hex-char map is monotonic ('0'..'9' < 'a'..'f').
  * Gram extraction is code-point based, matching `substr`'s character
  * semantics (not UTF-16 code units). WinnowFingerprintsSpec pins
  * equality against the composed-HOF twin on the real documents table.
  *
  * Null/edge semantics: null text → null; fewer than `w` grams (text
  * shorter than k+w-1 code points) → empty array, so callers that
  * pre-filter short docs and callers that don't agree on the contract.
  */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  require(k > 0 && w > 0)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"winnow_fingerprints expects string, got ${dt.simpleString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(v: Any): Any =
    WinnowFingerprints.compute(v.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.WinnowFingerprints.compute($t, $k, $w);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowFingerprints {
  /** Column API: distinct winnowing fingerprints of a string column. */
  def apply(text: Column, k: Int, w: Int): Column =
    graftbridge.toColumn(
      WinnowFingerprints(graftbridge.toExpression(text), k, w))

  private val md5Local: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  private val hexChars = "0123456789abcdef".toCharArray

  private def toHex(d: Array[Byte]): UTF8String = {
    val out = new Array[Byte](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = hexChars((d(i) >> 4) & 0xf).toByte
      out(2 * i + 1) = hexChars(d(i) & 0xf).toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  /** Unsigned byte compare == lexicographic compare of the hex form. */
  private def less(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < 16) {
      val ai = a(i) & 0xff; val bi = b(i) & 0xff
      if (ai != bi) return ai < bi
      i += 1
    }
    false
  }

  /** One-pass winnowing selection; called from both interpreted eval and
    * the generated code (keeps the operator inside whole-stage codegen
    * without inlining the loop bodies).
    */
  def compute(text: UTF8String, k: Int, w: Int): GenericArrayData = {
    val cp = text.toString.codePoints().toArray
    val nGrams = cp.length - k + 1
    if (nGrams < w) return new GenericArrayData(Array.empty[Any])
    // Hash every char k-gram once (code-point slices, matching substr).
    val md = md5Local.get()
    val digests = new Array[Array[Byte]](nGrams)
    var i = 0
    while (i < nGrams) {
      md.reset()
      digests(i) = md.digest(
        new String(cp, i, k).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      i += 1
    }
    // Monotonic deque of candidate indices: front = current window min.
    // The pop condition is true on equality, so ties keep the LATER
    // (rightmost) index — the Schleimer et al. robust-winnowing tie
    // rule; the selected VALUE is identical either way, and only values
    // reach the output.
    val deque = new Array[Int](nGrams)
    var head = 0; var tail = 0 // [head, tail) holds candidate indices
    val seen = new java.util.LinkedHashSet[UTF8String]()
    i = 0
    while (i < nGrams) {
      while (tail > head && !less(digests(deque(tail - 1)), digests(i))) tail -= 1
      deque(tail) = i; tail += 1
      if (deque(head) <= i - w) head += 1
      if (i >= w - 1) seen.add(toHex(digests(deque(head))))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new GenericArrayData(out)
  }
}
