package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into `private[sql]` Column↔Expression conversion (Spark 4's
  * Column wraps a ColumnNode, not an Expression). Lives in the
  * org.apache.spark.sql package purely for access — the standard pattern
  * for Catalyst-level extensions. */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** DataFrame from a logical plan (private[sql] Dataset.ofRows) — lets
    * the engine apply plan rewrites on ANALYZED plans, before the main
    * optimizer can collapse literal relations. */
  def ofRows(spark: SparkSession,
      plan: catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(
      spark.asInstanceOf[classic.SparkSession], plan)

  /** Build the V2 parquet Table for a path (internal constructor —
    * bridged for the GraftCatalog TableCatalog plugin). */
  def parquetTable(name: String, path: String): connector.catalog.Table =
    execution.datasources.v2.parquet.ParquetTable(
      name,
      classic.SparkSession.active,
      new org.apache.spark.sql.util.CaseInsensitiveStringMap(
        java.util.Map.of("path", path)),
      Seq(path),
      None,
      classOf[execution.datasources.parquet.ParquetFileFormat])
}
