package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StructField, StructType}

/** Algebraic range aggregation over one time slot — the kernel that
  * collapses a quadratic interval join into binary searches when the
  * join's OUTPUT is an aggregate (count/sum per probe), not the pair
  * list.
  *
  * Inputs (per slot row, both built by plain collect_list aggregations):
  *   - `probes`: array<struct<id, ts_us>> — the purchases whose look-back
  *     window intersects this slot;
  *   - `points`: array<struct<ts_us, value>> sorted by ts — the slot's
  *     clicks.
  * For each probe it binary-searches the half-open range
  * [ts−window, ts) and reads count and value-sum off a prefix-sum array
  * built once per call — O(C + P·log C) per slot versus the O(P·C)
  * candidate enumeration of the pair join (2.77 G pairs at the sf10
  * density; see BENCH_NOTES). Emits array<struct<id, n, sv>> partials;
  * a probe spanning two slots gets one partial from each, merged by the
  * downstream sum — the ranges never overlap because each slot's array
  * holds only its own points. */
case class SlotRangeAgg(left: Expression, right: Expression, windowUs: Long)
    extends BinaryExpression {

  require(windowUs > 0, "window must be positive")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("n", LongType, nullable = false),
    StructField("sv", DoubleType, nullable = false))), containsNull = false)

  override protected def nullSafeEval(probes: Any, points: Any): Any =
    SlotRangeAgg.partials(probes.asInstanceOf[ArrayData],
      points.asInstanceOf[ArrayData], windowUs)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (p, c) =>
      s"graft.functions.SlotRangeAgg.partials($p, $c, ${windowUs}L)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SlotRangeAgg {

  /** First index i with arr(i) >= key (arr ascending). */
  private def lowerBound(arr: Array[Long], key: Long): Int = {
    var lo = 0
    var hi = arr.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (arr(mid) < key) lo = mid + 1 else hi = mid
    }
    lo
  }

  /** Static so generated Java calls it directly. */
  def partials(probes: ArrayData, points: ArrayData,
      windowUs: Long): ArrayData = {
    val m = points.numElements()
    val ts = new Array[Long](m)
    val pre = new Array[Double](m + 1)
    var i = 0
    while (i < m) {
      val r = points.getStruct(i, 2)
      ts(i) = r.getLong(0)
      pre(i + 1) = pre(i) + r.getDouble(1)
      i += 1
    }
    val n = probes.numElements()
    val out = new Array[AnyRef](n)
    var j = 0
    while (j < n) {
      val p = probes.getStruct(j, 2)
      val t = p.getLong(1)
      val lo = lowerBound(ts, t - windowUs)
      val hi = lowerBound(ts, t)
      out(j) = new GenericInternalRow(Array[Any](
        p.getLong(0), (hi - lo).toLong, pre(hi) - pre(lo))): InternalRow
      j += 1
    }
    new GenericArrayData(out)
  }

  def slotRangeAgg(probes: Column, points: Column, windowUs: Long): Column =
    GraftSqlBridge.column(SlotRangeAgg(GraftSqlBridge.expression(probes),
      GraftSqlBridge.expression(points), windowUs))
}
