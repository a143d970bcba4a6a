package graft.functions

import java.util.{LinkedHashMap => JLinkedHashMap}

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-document term frequencies as one codegen'd pass:
  * `array<struct<term, tf>>` of the space-separated tokens, first-
  * occurrence order.
  *
  * All tokens of a document live in ONE input row, so its term counts
  * need no shuffle at all — `explode(term_counts(text))` replaces the
  * explode → groupBy(doc_id, term) formulation whose exchange moves one
  * row per (doc, term) across the cluster (measured: the largest single
  * stage of the TF-IDF pass at sf1). The downstream plan sees exactly
  * the rows the aggregation would have produced. */
case class TermCounts(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("term", StringType, nullable = false),
    StructField("tf", LongType, nullable = false))), containsNull = false)

  override def nullSafeEval(input: Any): Any =
    TermCounts.counts(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TermCounts.counts($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TermCounts {
  private val SPACE = UTF8String.fromString(" ")

  /** Static so generated Java calls it directly. */
  def counts(text: UTF8String): ArrayData = {
    val words = text.split(SPACE, -1)
    val m = new JLinkedHashMap[UTF8String, java.lang.Long]()
    var i = 0
    while (i < words.length) {
      val prev = m.get(words(i))
      m.put(words(i), if (prev == null) 1L else prev + 1L)
      i += 1
    }
    val out = new Array[AnyRef](m.size)
    val it = m.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      out(j) = new GenericInternalRow(
        Array[Any](e.getKey, e.getValue.longValue())): InternalRow
      j += 1
    }
    new GenericArrayData(out)
  }

  def termCounts(c: Column): Column =
    GraftSqlBridge.column(TermCounts(GraftSqlBridge.expression(c)))
}
