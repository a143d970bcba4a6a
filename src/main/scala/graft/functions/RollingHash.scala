package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Document fingerprint: minimum rolling (Karp–Rabin) hash over all
  * `window`-byte substrings of the UTF-8 text.
  *
  * This is the winnowing-style fingerprint the beyond-reference text layer
  * uses for cheap containment/overlap candidate detection: two documents
  * sharing any `window`-byte run have a good chance of sharing their
  * minimum window hash, so equal fingerprints are near-dup candidates.
  * One pass, O(n) per document, fully inside whole-stage codegen.
  */
case class RollingHashFingerprint(child: Expression, window: Int)
    extends UnaryExpression {

  require(window > 0, "window must be positive")

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    java.lang.Long.valueOf(RollingHashFingerprint.minRollingHash(bytes, window))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.RollingHashFingerprint.minRollingHash($c.getBytes(), $window)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RollingHashFingerprint {
  private final val B = 1000003L

  /** Static so generated Java code can call it (stays codegen-compatible
    * without inlining the loop). Unsigned min over window hashes. */
  def minRollingHash(bytes: Array[Byte], window: Int): Long = {
    val n = bytes.length
    if (n == 0) return 0L
    val w = math.min(window, n)
    // B^w with natural overflow — consistent everywhere.
    var bw = 1L
    var i = 0
    while (i < w) { bw *= B; i += 1 }
    var h = 0L
    i = 0
    while (i < w) { h = h * B + (bytes(i) & 0xffL); i += 1 }
    var min = h
    i = w
    while (i < n) {
      h = h * B + (bytes(i) & 0xffL) - bw * (bytes(i - w) & 0xffL)
      if (java.lang.Long.compareUnsigned(h, min) < 0) min = h
      i += 1
    }
    min
  }

  def rollingFingerprint(c: Column, window: Int = 8): Column =
    GraftSqlBridge.column(
      RollingHashFingerprint(GraftSqlBridge.expression(c), window))
}
