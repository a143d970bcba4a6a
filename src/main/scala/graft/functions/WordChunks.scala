package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Non-overlapping n-word chunks of a space-separated text, in document
  * order, partial tail chunk kept — the passage unit for duplicated-text
  * removal (Lee et al. 2022, "Deduplicating Training Data Makes Language
  * Models Better": repeated spans are removed from documents rather than
  * whole documents dropped).
  *
  * One codegen'd pass, like [[ShingleArray]] (which it deliberately does
  * NOT reuse: shingles are overlapping and deduped; passages are
  * non-overlapping, positional, and must keep every occurrence so the
  * downstream first-occurrence rule sees within-document repeats too).
  * The equivalent higher-order-function formulation
  * (`transform(sequence(...), i -> array_join(slice(ws, ...)))`) leaves
  * whole-stage codegen and re-evaluates the inlined `split()` per lambda
  * element — the measured ~20× shingle-stage trap (BENCH_NOTES.md).
  */
case class WordChunks(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, "chunk width must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    WordChunks.chunks(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.WordChunks.chunks($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordChunks {
  private val SPACE = UTF8String.fromString(" ")

  /** Static so generated Java calls it directly. ceil(words/n) chunks;
    * the last chunk holds the remainder words. Empty text → one empty
    * chunk (mirrors `string_split('' , ' ') = ['']`). */
  def chunks(text: UTF8String, n: Int): ArrayData = {
    val words = text.split(SPACE, -1)
    val m = (words.length + n - 1) / n
    val out = new Array[AnyRef](m)
    var c = 0
    while (c < m) {
      val start = c * n
      val len = math.min(n, words.length - start)
      val window = new Array[UTF8String](len)
      var j = 0
      while (j < len) { window(j) = words(start + j); j += 1 }
      out(c) = UTF8String.concatWs(SPACE, window.toIndexedSeq: _*)
      c += 1
    }
    new GenericArrayData(out)
  }

  def wordChunks(c: Column, n: Int = 10): Column =
    GraftSqlBridge.column(WordChunks(GraftSqlBridge.expression(c), n))
}
