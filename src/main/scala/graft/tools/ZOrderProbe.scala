package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.classic.ClassicConversions.castToImpl
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

import graft.Tables.t
import graft.operators.BucketedOps

/** Decade-tier measurement of the sort-clustered layouts (q174/q175):
  * layout write cost, then med-of-5 wall time AND rows-read for three
  * query shapes — the coarse 2-D box (q174), the single-user
  * drill-down (Z-order's asymmetric win), and the week window (q175) —
  * each against the raw table, the time-sorted layout, and the
  * Z-ordered layout. With an export dir, dumps both layouts' content
  * as plain parquet (same file/row-group clustering) so DuckDB can be
  * timed on the SAME artifacts (the fairness-pairing discipline of
  * LayoutExport).
  * Usage: SPARK_GRAFT_SF_DIR=benchdata/sf10 \
  *   runMain graft.tools.ZOrderProbe [exportDir]
  */
object ZOrderProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "benchdata/sf10")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory",
        sys.env.getOrElse("SPARK_DRIVER_MEM", "8g"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[A](f: => A): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    val tW = time(BucketedOps.eventsZOrder(spark, sfDir))
    val (zt, maxU) = BucketedOps.eventsZOrder(spark, sfDir)
    val tW2 = time(BucketedOps.eventsByTime(spark, sfDir))
    val tl = BucketedOps.eventsByTime(spark, sfDir)
    println(f"[zprobe] zorder_write $tW%6.2f s  timesort_write $tW2%6.2f s")

    def scansOf(df: DataFrame) =
      castToImpl(df).queryExecution.executedPlan.collect {
        case s: FileSourceScanExec => Seq(s)
        case a: AdaptiveSparkPlanExec => a.executedPlan.collect {
          case s: FileSourceScanExec => s
        }
      }.flatten

    // med-of-5 wall time via noop sink; rows-read from a separate
    // collect() pass (a noop WRITE re-plans, so scan nodes captured
    // from the initial plan never execute — collect() keeps the same
    // QueryExecution, the ZOrderSpec order)
    def med(mk: => DataFrame, label: String): Unit = {
      val ts = (1 to 5).map { _ =>
        time(mk.write.mode("overwrite").format("noop").save())
      }.sorted
      val df = mk
      val ss = scansOf(df)
      df.collect()
      val rows = ss.map(_.metrics("numOutputRows").value).sum
      println(f"[zprobe] $label%-16s ${ts(2)}%7.3f s " +
        f"[${ts.head}%.3f, ${ts.last}%.3f]  rows_read=$rows%,d")
    }

    val w = (maxU + 1L) / 8L
    def tsLit(s: String): Column = lit(s).cast("timestamp")
    def box(df: DataFrame): DataFrame = df
      .filter(col("user_id") >= lit(2L * w) && col("user_id") < lit(3L * w)
        && col("ts") >= tsLit("2024-01-10 00:00:00")
        && col("ts") < tsLit("2024-01-13 00:00:00"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_v"))
    def drill(df: DataFrame): DataFrame = df
      .filter(col("user_id") === lit(2L * w)
        && col("ts") >= tsLit("2024-01-05 00:00:00")
        && col("ts") < tsLit("2024-01-25 00:00:00"))
      .groupBy("event_type").agg(count(lit(1)).as("n"))
    def week(df: DataFrame): DataFrame = df
      .filter(col("ts") >= tsLit("2024-01-08 00:00:00")
        && col("ts") < tsLit("2024-01-15 00:00:00"))
      .groupBy(col("ts").cast("date").as("day"))
      .agg(count(lit(1)).as("n"), countDistinct("user_id").as("dau"),
        round(sum("value"), 2).as("sum_v"))

    def raw = t(spark, sfDir, "events")
      .select("event_id", "ts", "user_id", "event_type", "value")
    box(raw).write.mode("overwrite").format("noop").save() // warmup

    for ((q, f) <- Seq[(String, DataFrame => DataFrame)](
        "box" -> box, "drill" -> drill, "week" -> week);
      (src, df) <- Seq("raw" -> raw,
        "timesort" -> spark.table(tl), "zorder" -> spark.table(zt)))
      med(f(df), s"${q}_$src")

    // export layout content for the DuckDB side of the pairing —
    // the SAME file/row-group clustering as writeSorted produced
    args.headOption.foreach { out =>
      val files = BucketedOps.clusterFiles
      spark.table(zt).repartitionByRange(files, col("z"))
        .sortWithinPartitions("z")
        .write.mode("overwrite")
        .option("parquet.block.size", (4L << 20).toString)
        .parquet(s"$out/zorder")
      spark.table(tl).repartitionByRange(files, col("ts"))
        .sortWithinPartitions("ts")
        .write.mode("overwrite")
        .option("parquet.block.size", (4L << 20).toString)
        .parquet(s"$out/timesort")
      println(s"[zprobe] exported $out/zorder and $out/timesort " +
        s"(max_user=$maxU)")
    }
    spark.stop()
  }
}
