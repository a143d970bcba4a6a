package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.t

/** Round-10 action-floor A/B: within-process, median-of-N variants for
  * the small-input floor set (VERDICT r9 item 1). Each variant is a
  * complete production-candidate formulation; the adopted ones move
  * into the operator defs with the probe numbers in BENCH_NOTES. */
object FloorProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "benchdata/sf10")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPEATS", "7").toInt
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
    import graft.functions.CosineSimilarity.cosineSim

    def q45Lit(s: SparkSession, d: String): DataFrame = {
      val e = t(s, d, "embeddings")
      // 1-row point lookup (pushed vec_id filter): in any ANN service
      // the query vector arrives as an API argument; fetching it is not
      // a distributed stage
      val qv = e.filter(col("vec_id") === 0)
        .select("embedding").head().getSeq[Float](0).toArray
      val cos = round(cosineSim(col("embedding"), typedlit(qv)), 4)
      e.filter(col("vec_id") =!= 0)
        .select(col("vec_id").as("neighbor"), cos.as("cos_sim"))
        .orderBy(col("cos_sim").desc, col("neighbor"))
        .limit(10)
    }

    def q57Hof(s: SparkSession, d: String): DataFrame = {
      // ONE hash-agg shuffle, NO 10M-row sort: per-user timestamps
      // collect + in-expression sort; session breaks via a transform
      // over adjacent pairs. State per user = its own event count (the
      // q58 ASOF build-side bound).
      val arr = sort_array(collect_list(col("es")))
      t(s, d, "events")
        .select(col("user_id"), unix_timestamp(col("ts")).as("es"))
        .groupBy("user_id")
        .agg(arr.as("ts_arr"))
        .select(col("user_id"),
          (lit(1) + aggregate(
            zip_with(slice(col("ts_arr"), lit(1),
              greatest(size(col("ts_arr")) - 1, lit(0))),
              slice(col("ts_arr"), lit(2),
                greatest(size(col("ts_arr")) - 1, lit(0))),
              (a, b) => when(b - a > 1800, 1L).otherwise(0L)),
            lit(0L), (acc, x) => acc + x)).as("n_sessions"))
    }

    val variants: Seq[(String, () => DataFrame)] = Seq(
      "q45_current" -> (() =>
        graft.SparkEntry.queries("q45_ann_topk")(spark, sfDir)),
      "q45_lit" -> (() => q45Lit(spark, sfDir)),
      "q57_current" -> (() =>
        graft.SparkEntry.queries("q57_events_sessions")(spark, sfDir)),
      "q57_hof" -> (() => q57Hof(spark, sfDir)),
      "q05_current" -> (() =>
        graft.SparkEntry.queries("q05_agg_global")(spark, sfDir)),
      "q30_current" -> (() =>
        graft.SparkEntry.queries("q30_events_hourly")(spark, sfDir)))

    def run(name: String, mk: () => DataFrame): Unit = {
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        mk().write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"[floor] $name%-16s med ${times(times.size / 2)}%6.3f " +
        f"min ${times.head}%6.3f max ${times.last}%6.3f")
    }

    // warmup
    variants.foreach { case (_, mk) =>
      try mk().write.mode("overwrite").format("noop").save()
      catch { case e: Throwable => println(s"[floor] warmup fail: $e") }
    }
    variants.foreach { case (n, mk) => run(n, mk) }

    // AQE off: for tiny-shuffle queries the stage-materialization
    // barriers are the floor; measure what AQE itself costs
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    Seq("q05_noaqe" -> variants(4)._2, "q30_noaqe" -> variants(5)._2,
      "q45_lit_noaqe" -> variants(1)._2,
      "q57_hof_noaqe" -> variants(3)._2).foreach { case (n, mk) =>
      try { mk().write.mode("overwrite").format("noop").save(); run(n, mk) }
      catch { case e: Throwable => println(s"[floor] $n fail: $e") }
    }
    spark.conf.set("spark.sql.adaptive.enabled", "true")

    // correctness cross-check of the variants against current
    def sortedRows(df: DataFrame) = df.collect().map(_.toString).sorted
    assert(sortedRows(q57Hof(spark, sfDir)).sameElements(sortedRows(
      graft.SparkEntry.queries("q57_events_sessions")(spark, sfDir))),
      "q57 HOF variant diverges!")
    assert(sortedRows(q45Lit(spark, sfDir)).sameElements(sortedRows(
      graft.SparkEntry.queries("q45_ann_topk")(spark, sfDir))),
      "q45 literal variant diverges!")
    println("[floor] variant results identical to current")
    spark.stop()
  }
}
