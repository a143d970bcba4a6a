package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.EliminateSubqueryAliases
import org.apache.spark.sql.catalyst.expressions.{Alias, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LocalRelation, LogicalPlan}

import graft.Engine

/** `SELECT count(*) FROM t` over a path-registered parquet table folds
  * to its FOOTER row count — no data pages, no scan job (the
  * metadata fast path every native engine, including the reference's
  * DuckDB core, takes for a bare count). Applies only when
  *
  *  - the aggregate is exactly one ungrouped, unfiltered,
  *    non-distinct `count(1)` (what the analyzer lowers COUNT(*) to),
  *  - the input is the registered table's scan, unmodified — any
  *    Filter/Project/DML-rewrite in between makes the plans diverge
  *    and the rewrite stays out (a table mutated through the engine's
  *    copy-on-write DML re-registers WITHOUT a footer counter, so a
  *    post-INSERT count always recounts the real lineage).
  *
  * The fold substitutes a [[LocalRelation]] carrying the SAME output
  * attributes, so aliases, downstream operators, and the stats
  * recorder see an unchanged schema. */
object FooterCountRewrite {

  private def isCountStar(e: AggregateExpression): Boolean =
    !e.isDistinct && e.filter.isEmpty && (e.aggregateFunction match {
      case Count(Seq(Literal(1, _))) => true
      case _ => false
    })

  def rewrite(plan: LogicalPlan, engine: Engine): LogicalPlan = plan match {
    case agg @ Aggregate(Nil, Seq(Alias(ae: AggregateExpression, _)), child, _)
        if isCountStar(ae) =>
      engine.metadataCount(EliminateSubqueryAliases(child)) match {
        case Some(n) =>
          LocalRelation(agg.output, Seq(InternalRow(n)))
        case None => plan
      }
    case _ => plan
  }
}
