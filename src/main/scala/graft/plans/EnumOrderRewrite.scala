package graft.plans

import org.apache.spark.sql.catalyst.expressions.{ArrayPosition, Attribute, Literal, SortOrder}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Sort}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, StringType}

/** ORDER BY on an ENUM column sorts by declaration order, not lexically
  * (DuckDB enum semantics — enum_type_support.test:62-81). Enum columns
  * are carried as STRING here, so a plain `ORDER BY mood` would sort
  * lexically; this optimizer rule rewrites a SortOrder whose child is a
  * string attribute registered (with a unique name) as an enum column
  * into its `array_position(values, col)` declaration rank. Registered
  * via `Engine` (experimental.extraOptimizations) and
  * `GraftExtensions.injectOptimizerRule` — the Catalyst-native way to
  * change one operator's semantics without touching the parser.
  *
  * The rewrite requires the column name to map to exactly one registered
  * enum type: ambiguous names keep Spark's lexical order (the explicit
  * `enum_ord(type, col)` function remains the precise spelling).
  */
object EnumOrderRewrite extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case s: Sort =>
      val rewritten = s.order.map {
        case so @ SortOrder(a: Attribute, _, _, _)
            if a.dataType == StringType =>
          uniqueEnumFor(a.name) match {
            case Some(values) =>
              so.copy(child = ArrayPosition(
                Literal.create(values, ArrayType(StringType)), a))
            case None => so
          }
        case other => other
      }
      if (rewritten == s.order) s else s.copy(order = rewritten)
  }

  /** The enum values iff exactly one registered enum type owns a column
    * with this name. */
  private def uniqueEnumFor(colName: String): Option[Seq[String]] = {
    val types = graft.Engine.enumColumnTypes(colName)
    if (types.size == 1) graft.Engine.enums.get(types.head) else None
  }
}
