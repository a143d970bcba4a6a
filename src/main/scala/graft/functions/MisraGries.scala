package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitters sketch: at most `k` counters regardless of
  * stream length, mergeable across partitions (Agarwal et al. 2012,
  * "Mergeable Summaries"), so partial aggregation applies and the final
  * merge combines ≤ #partitions O(k) states — the one-pass answer to
  * "which tokens/domains/shingles are hot" that at 100 TB replaces a
  * full groupBy when only the heavy tail matters.
  *
  * State carries the cumulative decrement `d` explicitly, which makes
  * the output self-certifying: for every surviving candidate,
  * `est ≤ true_count ≤ est + d` (MG never overcounts; each decrement
  * round subtracts at most 1 from any single key's deficit), and any
  * key with `true_count > d` is guaranteed present. The classic
  * `d ≤ N/(k+1)` bound follows from the update/merge rules below.
  *
  * Output: array of (token, lo, hi) = (candidate, est, est + d),
  * sorted by est descending then token — note the candidate SET below
  * the guarantee line is execution-order-dependent (like any MG run),
  * so oracle checks assert the invariants, not the set.
  */
case class MisraGries(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MisraGries.State] {

  require(k >= 1, "counter budget must be >= 1")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("token", StringType, nullable = false),
    StructField("lo", LongType, nullable = false),
    StructField("hi", LongType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): MisraGries.State =
    new MisraGries.State(mutable.HashMap.empty, 0L)

  override def update(buf: MisraGries.State, input: InternalRow): MisraGries.State = {
    val v = child.eval(input)
    if (v != null) {
      // copy out of the (possibly reused) row buffer
      val key = v.asInstanceOf[UTF8String].toString
      val cur = buf.counts.getOrElse(key, 0L)
      if (cur > 0L) buf.counts.update(key, cur + 1L)
      else if (buf.counts.size < k) buf.counts.update(key, 1L)
      else {
        // full and unseen: decrement every counter by 1 (the new item's
        // own 1 cancels against the round), drop zeros
        buf.counts.mapValuesInPlace((_, c) => c - 1L)
        buf.counts.filterInPlace((_, c) => c > 0L)
        buf.d += 1L
      }
    }
    buf
  }

  override def merge(buf: MisraGries.State, other: MisraGries.State): MisraGries.State = {
    other.counts.foreach { case (key, c) =>
      buf.counts.update(key, buf.counts.getOrElse(key, 0L) + c)
    }
    buf.d += other.d
    if (buf.counts.size > k) {
      // subtract the (k+1)-th largest count from everything — the merge
      // rule that preserves the N/(k+1) error bound (Mergeable Summaries §3)
      val sorted = buf.counts.values.toArray
      java.util.Arrays.sort(sorted)
      val m = sorted(sorted.length - (k + 1)) // (k+1)-th largest
      buf.counts.mapValuesInPlace((_, c) => c - m)
      buf.counts.filterInPlace((_, c) => c > 0L)
      buf.d += m
    }
    buf
  }

  override def eval(buf: MisraGries.State): Any = {
    val rows = buf.counts.toArray
      .sortBy { case (key, c) => (-c, key) }
      .map { case (key, c) =>
        InternalRow(UTF8String.fromString(key), c, c + buf.d)
      }
    new GenericArrayData(rows.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: MisraGries.State): Array[Byte] = {
    val entries = buf.counts.toArray.map { case (key, c) =>
      (key.getBytes(StandardCharsets.UTF_8), c)
    }
    val size = 8 + 4 + entries.map(e => 4 + e._1.length + 8).sum
    val bb = ByteBuffer.allocate(size)
    bb.putLong(buf.d)
    bb.putInt(entries.length)
    entries.foreach { case (bytes, c) =>
      bb.putInt(bytes.length); bb.put(bytes); bb.putLong(c)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): MisraGries.State = {
    val bb = ByteBuffer.wrap(bytes)
    val d = bb.getLong
    var n = bb.getInt
    val counts = mutable.HashMap.empty[String, Long]
    while (n > 0) {
      val len = bb.getInt
      val kb = new Array[Byte](len)
      bb.get(kb)
      counts.update(new String(kb, StandardCharsets.UTF_8), bb.getLong)
      n -= 1
    }
    new MisraGries.State(counts, d)
  }

  override def withNewMutableAggBufferOffset(n: Int): MisraGries =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): MisraGries =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGries =
    copy(child = newChildren.head)
}

object MisraGries {
  /** counters (≤ k entries) + cumulative decrement. */
  final class State(val counts: mutable.HashMap[String, Long], var d: Long)

  def misraGries(c: Column, k: Int): Column =
    GraftSqlBridge.column(
      MisraGries(GraftSqlBridge.expression(c), k)
        .toAggregateExpression(isDistinct = false))
}
