package graft.plans

import org.apache.spark.sql.catalyst.expressions.{ArrayPosition, Attribute, BinaryComparison, Expression, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, Literal, SortOrder}
import org.apache.spark.sql.catalyst.expressions.aggregate.{Max, MaxBy, Min, MinBy}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Sort}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Enum columns compare by DECLARATION order, not lexically (DuckDB enum
  * semantics — enum_type_support.test:62-81, 225-260). Enum columns are
  * carried as STRING here, so plain `ORDER BY mood`, `MAX(mood)` or
  * `mood < 'neutral'` would be lexical; this optimizer rule rewrites the
  * three order-sensitive shapes over attributes registered (with a
  * unique name) as enum columns:
  *
  *  - SortOrder(col)           → SortOrder(array_position(values, col))
  *  - Min(col) / Max(col)      → MinBy / MaxBy over the declaration rank
  *  - col <,≤,>,≥ 'lit'/col₂   → rank(col) ⊕ rank('lit')/rank(col₂)
  *
  * Registered via `Engine` (experimental.extraOptimizations) and
  * `GraftExtensions.injectOptimizerRule` — the Catalyst-native way to
  * change operator semantics without touching the parser. Ambiguous
  * column names keep Spark's lexical order (the explicit
  * `enum_ord(type, col)` function remains the precise spelling), and
  * equality is untouched (string equality IS enum equality).
  */
object EnumOrderRewrite extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case s: Sort =>
      val rewritten = s.order.map {
        case so @ SortOrder(EnumAttr(a, values), _, _, _) =>
          so.copy(child = rank(a, values))
        case other => other
      }
      if (rewritten == s.order) s else s.copy(order = rewritten)

    case a: Aggregate =>
      a.transformExpressions {
        case Min(EnumAttr(at, values)) => MinBy(at, rank(at, values))
        case Max(EnumAttr(at, values)) => MaxBy(at, rank(at, values))
      }

    case f: Filter =>
      f.transformExpressions {
        case cmp: BinaryComparison if isOrderCmp(cmp) =>
          (cmp.left, cmp.right) match {
            case (EnumAttr(a, values), l: Literal) =>
              rankLiteral(values, l).map(rl =>
                cmp.withNewChildren(Seq(rank(a, values), rl)))
                .getOrElse(cmp)
            case (l: Literal, EnumAttr(a, values)) =>
              rankLiteral(values, l).map(rl =>
                cmp.withNewChildren(Seq(rl, rank(a, values))))
                .getOrElse(cmp)
            case (EnumAttr(a1, v1), EnumAttr(a2, v2)) if v1 == v2 =>
              cmp.withNewChildren(Seq(rank(a1, v1), rank(a2, v2)))
            case _ => cmp
          }
      }
  }

  private def isOrderCmp(e: Expression): Boolean = e match {
    case _: GreaterThan | _: GreaterThanOrEqual |
         _: LessThan | _: LessThanOrEqual => true
    case _ => false
  }

  private def rank(a: Expression, values: Seq[String]): Expression =
    ArrayPosition(Literal.create(values, ArrayType(StringType)), a)

  /** Extractor: a string attribute whose name maps to exactly one
    * registered enum column. */
  private object EnumAttr {
    def unapply(e: Expression): Option[(Attribute, Seq[String])] = e match {
      case a: Attribute if a.resolved && a.dataType == StringType =>
        val types = graft.Engine.enumColumnTypes(a.name)
        if (types.size == 1) graft.Engine.enums.get(types.head).map((a, _))
        else None
      case _ => None
    }
  }

  /** A string literal's declaration rank, iff it is a member of the
    * enum (a non-member comparison keeps lexical semantics rather than
    * silently misranking). */
  private def rankLiteral(values: Seq[String],
      lit: Literal): Option[Expression] = lit.value match {
    case s: UTF8String if values.contains(s.toString) =>
      Some(Literal(values.indexOf(s.toString) + 1L))
    case _ => None
  }
}
