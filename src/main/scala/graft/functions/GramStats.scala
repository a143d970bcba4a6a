package graft.functions

import java.util.{HashMap => JHashMap}

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-document word-n-gram repetition statistics as ONE codegen'd
  * pass: `struct<tc, dc>` where `tc` = characters of the single most
  * frequent n-gram × its count (ties to the binary-smallest gram —
  * DuckDB's ORDER BY collation) and `dc` = Σ count·chars over grams
  * occurring ≥ 2 times. Char counts are code points (Spark `length`
  * / DuckDB `len` semantics); gram chars include the joining spaces.
  *
  * All n-grams of a document live in ONE input row, so the Gopher
  * repetition rules (q185) need no explode and no shuffle at all —
  * the five (doc, n, gram) corpus aggregations this replaces were the
  * whole cost of the first formulation (the same law as TermCounts:
  * per-document state must never cross the cluster). */
case class GramStats(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("tc", LongType, nullable = false),
    StructField("dc", LongType, nullable = false)))

  override def nullSafeEval(input: Any): Any =
    GramStats.stats(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GramStats.stats($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object GramStats {
  private val SPACE = UTF8String.fromString(" ")

  /** Static so generated Java calls it directly. */
  def stats(text: UTF8String, n: Int): InternalRow = {
    val words = text.split(SPACE, -1)
    if (words.length < n)
      return new GenericInternalRow(Array[Any](0L, 0L))
    val m = new JHashMap[UTF8String, java.lang.Long]()
    var i = 0
    while (i + n <= words.length) {
      val parts = new Array[UTF8String](n)
      System.arraycopy(words, i, parts, 0, n)
      val g = UTF8String.concatWs(SPACE, parts: _*)
      val prev = m.get(g)
      m.put(g, if (prev == null) 1L else prev + 1L)
      i += 1
    }
    var bestCnt = 0L
    var bestGram: UTF8String = null
    var dup = 0L
    val it = m.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cnt = e.getValue.longValue()
      if (cnt > bestCnt ||
          (cnt == bestCnt && e.getKey.compareTo(bestGram) < 0)) {
        bestCnt = cnt
        bestGram = e.getKey
      }
      if (cnt >= 2L) dup += cnt * e.getKey.numChars()
    }
    new GenericInternalRow(
      Array[Any](bestCnt * bestGram.numChars(), dup))
  }

  def gramStats(c: Column, n: Int): Column =
    GraftSqlBridge.column(GramStats(GraftSqlBridge.expression(c), n))
}
