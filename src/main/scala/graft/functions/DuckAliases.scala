package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{ArrayContains, ElementAt, Expression, Size}

/** SQL-name parity with the DuckDB function surface the reference's tests
  * exercise (ref: /root/reference/test/sql/list_type_support.test:96-133 —
  * `len(list)`, `list[i]` 1-based, `list_contains`, `unnest`).
  *
  * Spark equivalents exist under different names (`size`, `element_at`,
  * `array_contains`, `explode`); we register thin aliases in the session
  * FunctionRegistry so the reference's SQL runs verbatim. `element_at` is
  * already 1-based, matching DuckDB list indexing.
  */
object DuckAliases {
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(
      "len", (e: Seq[Expression]) => Size(e.head), "built-in")
    reg.createOrReplaceTempFunction(
      "list_contains", (e: Seq[Expression]) => ArrayContains(e(0), e(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "list_extract", (e: Seq[Expression]) => ElementAt(e(0), e(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "cosine_similarity",
      (e: Seq[Expression]) => CosineSimilarity(e(0), e(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "rolling_fingerprint",
      (e: Seq[Expression]) => e match {
        case Seq(c) => RollingHashFingerprint(c, 8)
        case Seq(c, w) => RollingHashFingerprint(
          c, w.eval().asInstanceOf[Number].intValue())
      }, "built-in")
  }
}
