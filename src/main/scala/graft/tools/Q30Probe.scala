package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables.t

/** Stage decomposition of q30_events_hourly (the worst remaining
  * small-query ratio): scan → truncate-project → partial+final agg,
  * plus formulation variants, so the residual vs DuckDB is attributed
  * to a stage rather than hand-waved.
  * Usage: SPARK_GRAFT_SF_DIR=benchdata/sf10 runMain graft.tools.Q30Probe
  */
object Q30Probe {
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

    def time[A](f: => A): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def med(mk: => org.apache.spark.sql.DataFrame, label: String): Unit = {
      val ts = (1 to 5).map { _ =>
        time(mk.write.mode("overwrite").format("noop").save())
      }.sorted
      println(f"[q30probe] $label%-26s ${ts(2)}%6.3f s [${ts.head}%.3f, ${ts.last}%.3f]")
    }

    def ev = t(spark, sfDir, "events")
    // warmup
    ev.groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_v"))
      .write.mode("overwrite").format("noop").save()

    med(ev.select("event_type", "ts", "value"), "p1_scan3cols")
    med(ev.select(col("event_type"),
      date_trunc("hour", col("ts")).as("h"), col("value")), "p2_trunc_project")
    med(ev.groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_v")),
      "p3_full_q30")
    // variant: truncate in integer µs space, stamp timestamp after agg
    med(ev.select(col("event_type"),
        (unix_micros(col("ts")).divide(lit(3600000000L)).cast("long"))
          .as("hb"), col("value"))
      .groupBy("event_type", "hb")
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_v"))
      .withColumn("h", timestamp_micros(col("hb") * 3600000000L))
      .drop("hb"), "v1_int_hour_bucket")
    // variant: raw parquet read without the ts_ns normalization column
    med(spark.read.parquet(s"$sfDir/events.parquet")
      .select(col("event_type"),
        date_trunc("hour", col("ts").cast("timestamp")).as("h"),
        col("value"))
      .groupBy("event_type", "h")
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_v")),
      "v2_raw_no_normalize")

    // q57 (events sessions) decomposition: scan → user-shuffle+sort →
    // lag window → rollup, so its ratio label carries a stage account
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts")
    def evU = ev.select(col("user_id"), unix_timestamp(col("ts")).as("es"),
      col("ts"))
    med(evU.drop("ts"), "q57_p1_scan2cols")
    med(evU.repartition(col("user_id")).sortWithinPartitions("user_id", "ts")
      .drop("ts"), "q57_p2_shuffle_sort")
    med(evU.withColumn("brk",
        when(col("es") - org.apache.spark.sql.functions.lag("es", 1)
          .over(w) > 1800, 1).otherwise(0)).drop("ts"),
      "q57_p3_lag_window")
    med(evU.withColumn("brk",
        when(col("es") - org.apache.spark.sql.functions.lag("es", 1)
          .over(w) > 1800, 1).otherwise(0))
      .groupBy("user_id")
      .agg((sum("brk") + 1).cast("long").as("n_sessions")),
      "q57_p4_full")
    spark.stop()
  }
}
