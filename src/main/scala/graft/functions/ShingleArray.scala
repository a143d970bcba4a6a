package graft.functions

import java.util.LinkedHashSet

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct n-word shingles of a space-separated text, as one codegen'd
  * pass over the UTF-8 bytes.
  *
  * Semantics match the SQL formulation
  * `list_distinct(list_transform(range(...), i -> ws[i]||' '||ws[i+1]||...))`
  * (split on a single space, windows joined by a space, first-occurrence
  * dedup) — but the equivalent Spark higher-order-function expression
  * falls out of whole-stage codegen and re-evaluates `split()` per lambda
  * element access; measured ~20× slower on the shingle stage of the
  * n-gram dedup pipeline. Shingling stays inside the scan stage: no
  * shuffle, no interpreted lambdas, which is what survives 100 TB.
  */
case class ShingleArray(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, "shingle width must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    ShingleArray.shingles(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.ShingleArray.shingles($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleArray {
  private val SPACE = UTF8String.fromString(" ")

  /** Static so generated Java calls it directly. Distinct (first
    * occurrence order) n-word windows; texts under n words yield an
    * empty array. */
  def shingles(text: UTF8String, n: Int): ArrayData = {
    val words = text.split(SPACE, -1)
    if (words.length < n) return new GenericArrayData(Array.empty[Any])
    val seen = new LinkedHashSet[UTF8String]()
    var i = 0
    while (i <= words.length - n) {
      val window = new Array[UTF8String](n)
      var j = 0
      while (j < n) { window(j) = words(i + j); j += 1 }
      seen.add(UTF8String.concatWs(SPACE, window: _*))
      i += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[AnyRef]])
  }

  def shingleArray(c: Column, n: Int = 3): Column =
    GraftSqlBridge.column(ShingleArray(GraftSqlBridge.expression(c), n))
}
