package graft.functions

import java.util.{HashSet => JHashSet}

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct n-word shingle *hashes* (xxhash64, seed 42 — identical to
  * `xxhash64(shingle_string)`) in one codegen'd pass.
  *
  * The dedup pipelines only ever join/aggregate on the 8-byte hash, so
  * materializing shingle strings just to hash them downstream pays for
  * exploded string rows, a per-row hash expression, and byte-wise
  * dedup of full strings. Hashing inside the expression keeps the
  * explode output at 8 bytes per shingle and dedups on longs —
  * BENCH_NOTES measured shingling as the largest stage of both q41 and
  * q42, and this halves its allocation traffic.
  */
case class ShingleHashArray(child: Expression, n: Int)
    extends UnaryExpression {

  require(n >= 1, "shingle width must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    ShingleHashArray.shingleHashes(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.ShingleHashArray.shingleHashes($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleHashArray {
  private val SPACE = UTF8String.fromString(" ")
  private val SEED = 42L // Spark's xxhash64 seed — hashes interchange

  /** Static so generated Java calls it directly. First-occurrence
    * distinct hashes of the n-word windows; texts under n words yield
    * an empty array. */
  def shingleHashes(text: UTF8String, n: Int): ArrayData = {
    val words = text.split(SPACE, -1)
    if (words.length < n) return new GenericArrayData(Array.empty[Long])
    val seen = new JHashSet[java.lang.Long]()
    val out = new Array[Long](words.length - n + 1)
    var m = 0
    var i = 0
    val window = new Array[UTF8String](n)
    while (i <= words.length - n) {
      var j = 0
      while (j < n) { window(j) = words(i + j); j += 1 }
      val s = UTF8String.concatWs(SPACE, window.toIndexedSeq: _*)
      val h = XXH64.hashUnsafeBytes(
        s.getBaseObject, s.getBaseOffset, s.numBytes, SEED)
      if (seen.add(h)) { out(m) = h; m += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, m))
  }

  def shingleHashArray(c: Column, n: Int = 3): Column =
    GraftSqlBridge.column(ShingleHashArray(GraftSqlBridge.expression(c), n))

  /** ALL n-word window hashes in positional order (no dedup) — the
    * exact-substring span pass (q173) needs positions to merge
    * overlapping duplicated windows into covered-token counts, so it
    * posexplodes this instead of exploding the distinct set. */
  def positionalShingleHashes(text: UTF8String, n: Int): ArrayData = {
    val words = text.split(SPACE, -1)
    if (words.length < n) return new GenericArrayData(Array.empty[Long])
    val out = new Array[Long](words.length - n + 1)
    var i = 0
    val window = new Array[UTF8String](n)
    while (i <= words.length - n) {
      var j = 0
      while (j < n) { window(j) = words(i + j); j += 1 }
      val s = UTF8String.concatWs(SPACE, window.toIndexedSeq: _*)
      out(i) = XXH64.hashUnsafeBytes(
        s.getBaseObject, s.getBaseOffset, s.numBytes, SEED)
      i += 1
    }
    new GenericArrayData(out)
  }

  def positionalShingleHashArray(c: Column, n: Int): Column =
    GraftSqlBridge.column(
      PositionalShingleHashes(GraftSqlBridge.expression(c), n))
}

/** Positional sibling of [[ShingleHashArray]]: one hash per window,
  * in order, duplicates preserved. */
case class PositionalShingleHashes(child: Expression, n: Int)
    extends UnaryExpression {

  require(n >= 1, "shingle width must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    ShingleHashArray.positionalShingleHashes(
      input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.ShingleHashArray.positionalShingleHashes($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
