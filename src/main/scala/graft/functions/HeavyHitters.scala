package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.graftbridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst AGGREGATE (TypedImperativeAggregate): Misra-Gries
  * heavy-hitters sketch — approximate item frequencies in ONE pass with
  * a buffer of at most `k` counters per partial, mergeable across
  * partitions. The exact alternative (groupBy item → count → top-k)
  * shuffles every distinct item; this shuffles ≤ k counters per map
  * task, which is the difference between a pass and a job at 100 TB
  * vocabularies.
  *
  * Guarantees (independent of row order and partition layout — the
  * classic Misra-Gries bound and the Agarwal et al. 2012 mergeability
  * result):
  *   - estimates are UNDER-estimates: est(x) ≤ true(x);
  *   - error is bounded: true(x) − est(x) ≤ N/(k+1) for N total rows;
  *   - hence every item with true(x) > N/(k+1) is present.
  * The BUFFER CONTENTS are order-dependent (which sub-threshold items
  * survive ties varies with arrival order), so queries gate the
  * guarantees — deterministic booleans against in-query exact counts —
  * not the raw sketch (the same contract style as the ANN recall
  * gates). Returns map<string,long> of item → estimated count.
  *
  * Cost: O(1) per hit; a miss with a full buffer pays one O(k)
  * decrement sweep (k is a small constant — the sketch IS the memory
  * bound, that's the point).
  */
case class HeavyHitters(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[HeavyHitters.Buffer] {

  require(k > 0)

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"heavy_hitters expects string, got ${dt.simpleString}")
  }

  override def dataType: DataType = MapType(StringType, LongType, false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): HeavyHitters.Buffer =
    new HeavyHitters.Buffer(mutable.HashMap.empty)

  override def update(buf: HeavyHitters.Buffer, input: InternalRow): HeavyHitters.Buffer = {
    val v = child.eval(input)
    if (v != null) buf.addOne(v.asInstanceOf[UTF8String].toString, k)
    buf
  }

  override def merge(buf: HeavyHitters.Buffer, other: HeavyHitters.Buffer): HeavyHitters.Buffer = {
    // mergeability: sum counters exactly, then re-trim to k by
    // subtracting the (k+1)-th largest merged count (Agarwal et al.) —
    // the result obeys the same N/(k+1) bound as a single-pass sketch
    other.counts.foreach { case (item, c) =>
      buf.counts.update(item, buf.counts.getOrElse(item, 0L) + c)
    }
    buf.trim(k)
    buf
  }

  override def eval(buf: HeavyHitters.Buffer): Any = {
    val entries = buf.counts.toSeq.sortBy { case (item, c) => (-c, item) }
    new ArrayBasedMapData(
      new GenericArrayData(entries.map(e => UTF8String.fromString(e._1)).toArray[Any]),
      new GenericArrayData(entries.map(e => java.lang.Long.valueOf(e._2)).toArray[Any]))
  }

  override def serialize(buf: HeavyHitters.Buffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.counts.size)
    buf.counts.foreach { case (item, c) =>
      val b = item.getBytes("UTF-8")
      out.writeInt(b.length); out.write(b); out.writeLong(c)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): HeavyHitters.Buffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val m = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt(); val b = new Array[Byte](len); in.readFully(b)
      m.put(new String(b, "UTF-8"), in.readLong())
      i += 1
    }
    new HeavyHitters.Buffer(m)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HeavyHitters =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HeavyHitters =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object HeavyHitters {

  /** Column API: Misra-Gries sketch of a string column as an aggregate. */
  def apply(c: Column, k: Int): Column =
    graftbridge.toColumn(
      HeavyHitters(graftbridge.toExpression(c), k).toAggregateExpression())

  final class Buffer(val counts: mutable.HashMap[String, Long]) {

    /** One observation: increment a tracked item, insert if room, else
      * decrement-all (the incoming observation is discarded with them).
      */
    def addOne(item: String, cap: Int): Unit =
      counts.get(item) match {
        case Some(c) => counts.update(item, c + 1)
        case None if counts.size < cap => counts.put(item, 1L)
        case None =>
          counts.mapValuesInPlace((_, c) => c - 1)
          counts.filterInPlace((_, c) => c > 0)
      }

    /** Shrink to ≤ cap counters by subtracting the (cap+1)-th largest
      * count from everything and dropping the non-positive.
      */
    def trim(cap: Int): Unit =
      if (counts.size > cap) {
        val sorted = counts.values.toArray
        java.util.Arrays.sort(sorted)
        val cut = sorted(counts.size - cap - 1) // (cap+1)-th largest
        counts.mapValuesInPlace((_, c) => c - cut)
        counts.filterInPlace((_, c) => c > 0)
      }
  }
}
