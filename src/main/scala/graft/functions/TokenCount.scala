package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Whitespace token count WITHOUT materializing the tokens:
  * `size(split(text, " ", -1))` allocates one UTF8String per word just
  * to take the array's length — on a corpus-scale tokenize pass that is
  * the dominant allocation. The count equals spaces+1 exactly: the
  * single-space split never merges delimiters and keeps leading/
  * trailing empties, and a UTF-8 multibyte character can never contain
  * 0x20 (continuation bytes are >= 0x80), so one byte scan suffices.
  * Matches DuckDB's `len(string_split(text, ' '))` (same keep-empties
  * semantics; `'' -> ['']` -> 1). */
case class TokenCount(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    TokenCount.count(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TokenCount.count($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TokenCount {
  /** Static so generated Java calls it directly. */
  def count(text: UTF8String): Long = {
    val n = text.numBytes
    var i = 0
    var c = 1L
    while (i < n) {
      if (text.getByte(i) == 0x20) c += 1
      i += 1
    }
    c
  }

  def tokenCount(c: Column): Column =
    GraftSqlBridge.column(TokenCount(GraftSqlBridge.expression(c)))
}
