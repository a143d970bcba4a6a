package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-tier probe rows that the basket bench can't express (dev
  * tool, feeds BENCH_NOTES): the q94 sketch-only pass (production
  * per-query cost — the basket entry carries the per-snapshot audit
  * too) and q97's stage-prefix accounting (attributes its wall time
  * to scan / offsets / window / final-agg so the multi-stage floor
  * claim is proven or refuted with numbers). Median-of-5 with spread,
  * same measurement discipline as graft.Bench. */
object TierProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "benchdata/sf10")
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
    graft.functions.DuckAliases.register(spark)

    def docsTok(d: String): DataFrame =
      graft.Tables.t(spark, d, "documents")
        .select(col("doc_id"), col("lang"),
          graft.functions.TokenCount.tokenCount(col("text")).as("tok"))

    val probes: Seq[(String, () => DataFrame)] =
      Seq("q94_sketch_only" ->
            (() => graft.operators.AdvancedOps.q94SketchOnly(spark, sfDir)),
          "q97_full" ->
            (() => graft.SparkEntry
              .queries("q97_shard_packing")(spark, sfDir))) ++
        graft.operators.CurationOps.packShardsStages(docsTok(sfDir))
          .map { case (n, df) => s"q97_$n" -> (() => df) }

    probes.foreach { case (name, mk) =>
      mk().write.mode("overwrite").format("noop").save() // warm codegen
      val times = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        mk().write.mode("overwrite").format("noop").save()
        spark.catalog.clearCache()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"[probe] $name%-18s median=${times(2)}%6.3f s  " +
        f"min=${times.head}%6.3f  max=${times.last}%6.3f")
    }
    spark.stop()
  }
}
