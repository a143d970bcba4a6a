package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{ArrayContains, ElementAt, Explode, Expression, ExpressionInfo, Size}

import graft.functions.{CosineSimilarity, RollingHashFingerprint, ShingleArray, ShingleHashArray, TermCounts, WordChunks}

/** SparkSessionExtensions entry point — the standard deployment path for
  * a Spark library's Catalyst extensions:
  *
  * {{{
  * spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  * // or
  * SparkSession.builder().withExtensions(new GraftExtensions) ...
  * }}}
  *
  * Injects the engine's custom expressions (cosine_similarity,
  * shingle_array, rolling_fingerprint) and the DuckDB-name aliases
  * (len, list_contains, list_extract) into every session derived from
  * the extended builder. `Engine.apply` registers the same set
  * imperatively for sessions built without extensions.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach { case (name, builder) =>
      ext.injectFunction(
        (FunctionIdentifier(name),
          new ExpressionInfo("graft", name),
          builder))
    }
    // ORDER BY / MIN / MAX / comparisons on registered enum and hugeint
    // columns follow declaration/numeric order; post-hoc resolution runs
    // on the analyzed plan, before literal-relation collapse. The rule
    // resolves through the session's current Engine (per-engine catalogs).
    ext.injectPostHocResolutionRule(session =>
      graft.plans.EnumOrderRewrite(() => Engine.forSession(session)))
    // covered aggregates over a managed base table re-target its fresh
    // materialized aggregate (partial re-aggregation)
    ext.injectPostHocResolutionRule(session =>
      graft.plans.MatViewRewrite(() => Engine.forSession(session)))
  }
}

object GraftExtensions {
  private def intLit(e: Expression): Int =
    e.eval().asInstanceOf[Number].intValue()

  val functions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "cosine_similarity" -> (e => CosineSimilarity(e(0), e(1))),
    "shingle_array" -> {
      case Seq(c) => ShingleArray(c, 3)
      case Seq(c, n) => ShingleArray(c, intLit(n))
    },
    "rolling_fingerprint" -> {
      case Seq(c) => RollingHashFingerprint(c, 8)
      case Seq(c, w) => RollingHashFingerprint(c, intLit(w))
    },
    "shingle_hash_array" -> {
      case Seq(c) => ShingleHashArray(c, 3)
      case Seq(c, n) => ShingleHashArray(c, intLit(n))
    },
    "word_chunks" -> {
      case Seq(c) => WordChunks(c, 10)
      case Seq(c, n) => WordChunks(c, intLit(n))
    },
    "term_counts" -> (e => TermCounts(e.head)),
    "len" -> (e => Size(e.head)),
    "unnest" -> (e => Explode(e.head)),
    "list_contains" -> (e => ArrayContains(e(0), e(1))),
    "list_extract" -> (e => ElementAt(e(0), e(1))))
}
