package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** A/B probe for the q97 offsets branch (dev tool, feeds BENCH_NOTES):
  *
  *  A (shipped r12–r15): offsets = max(cum_in) per (lang, b) — derives
  *    from the WINDOWED frame so the two exchange consumers stay
  *    byte-identical (ReusedExchange), but puts the corpus sort+window
  *    on the offsets path's critical chain.
  *  B (candidate): offsets = sum(tok) per (lang, b) straight off the
  *    repartitioned frame — a hash aggregate with NO sort. The agg
  *    folds `0 * coalesce(doc_id, 0)` into its sum argument so column
  *    pruning cannot strip doc_id from the aggregate's copy of the
  *    exchange (no Catalyst rule rewrites x*0 — it is not sound for
  *    nulls and no null-aware variant exists), keeping both consumers
  *    on the one corpus exchange.
  *
  * Prints Exchange/ReusedExchange counts per variant plus med-of-5
  * timings, so the reuse claim is verified structurally, not assumed.
  */
object Q97Fuse {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("benchdata/sf10")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.files.maxPartitionBytes", "32m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def docsTok: DataFrame =
      graft.Tables.t(spark, sfDir, "documents")
        .select(col("doc_id"), col("lang"),
          graft.functions.TokenCount.tokenCount(col("text")).as("tok"))

    def variantA(docs: DataFrame): DataFrame =
      graft.operators.CurationOps.packShards(docs)

    def variantB(docs: DataFrame): DataFrame = {
      val b = docs.filter(col("lang").isNotNull)
        .withColumn("b", floor(col("doc_id") / 8192L))
        .filter(col("b").isNotNull)
        .repartition(col("lang"), col("b"))
      val wIn = Window.partitionBy("lang", "b").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cumIn = b.withColumn("cum_in", sum("tok").over(wIn))
      val wBuck = Window.partitionBy("lang").orderBy("b")
      val offsets = b.groupBy("lang", "b")
        .agg(sum(col("tok") + lit(0L) * coalesce(col("doc_id"), lit(0L)))
          .as("bt"))
        .withColumn("off", sum("bt").over(wBuck) - col("bt"))
        .drop("bt")
      cumIn.join(broadcast(offsets), Seq("lang", "b"))
        .withColumn("cum", col("cum_in") + col("off"))
        .groupBy(col("lang"),
          ((col("cum") - col("tok")) / 2000L).cast("long").as("shard"))
        .agg(count(lit(1)).as("n_docs"), sum("tok").as("sum_tokens"))
        .orderBy("lang", "shard")
    }

    val variants = Seq("A_window_max" -> (() => variantA(docsTok)),
      "B_agg_fused" -> (() => variantB(docsTok)))
    variants.foreach { case (name, mk) =>
      val plan = mk().queryExecution.executedPlan.toString
      val ex = "(?m)^\\s*[+:*]*-? ?Exchange ".r
        .findAllIn(plan).length
      println(s"[q97fuse] $name exchanges(pre-AQE)=$ex")
      mk().write.mode("overwrite").format("noop").save() // warm + AQE
      val rows = mk().collect().map(_.toString).toSeq
      println(s"[q97fuse] $name rows=${rows.size} head=${rows.take(3)}")
      val times = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        mk().write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"[q97fuse] $name%-14s median=${times(2)}%6.3f s " +
        f"min=${times.head}%6.3f max=${times.last}%6.3f")
    }
    // equality check A == B (exact rows)
    val a = variantA(docsTok).collect().map(_.toString).toSeq
    val bv = variantB(docsTok).collect().map(_.toString).toSeq
    println(s"[q97fuse] identical=${a == bv} (${a.size} rows)")
    spark.stop()
  }
}
