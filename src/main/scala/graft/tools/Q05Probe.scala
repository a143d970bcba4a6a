package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t

/** q05 floor decomposition (VERDICT r10 item 4): the reference
  * short-circuits sub-row-group tables to a single task
  * (task_partitioner.cpp:14-21); q05's residual over DuckDB at sf10 is
  * claimed to be fixed task-launch/driver constants on a problem whose
  * COMPUTE is already at parity. This probe prints the decomposition:
  *
  *   a. q05 at sf0.1 — data is 1% of sf10, so this is ≈ the pure
  *      fixed constant (job submit + task launch + result fetch)
  *   b. q05 at sf10 — constant + real columnar decode/agg
  *   c. bare 4-column scan-agg at sf10, no round/aliases — shows the
  *      expression layer costs nothing beyond the scan
  *   d. q05 at sf10 forced to ONE scan task (the reference's DELEGATED
  *      analog) — shows the fan-out is right at this size and the
  *      constant is not removable by fewer tasks
  *
  * (b − a) vs DuckDB's whole-query time is the at-parity claim; the
  * numbers land in BENCH_NOTES round 11. */
object Q05Probe {
  def main(args: Array[String]): Unit = {
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPEATS", "7").toInt
    val sf01 = "/root/testdata/sf0.1"
    val sf10 = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "benchdata/sf10")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.files.maxPartitionBytes", "128m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def q05(d: String): DataFrame =
      graft.SparkEntry.queries("q05_agg_global")(spark, d)
    def bare(d: String): DataFrame = t(spark, d, "lineitem").agg(
      count(lit(1)), sum("l_quantity"), avg("l_extendedprice"),
      min("l_discount"), max("l_tax"))

    def med(label: String)(mk: => DataFrame): Unit = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        mk.write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"[q05probe] $label%-28s med ${ts(ts.size / 2)}%.3f  " +
        f"min ${ts.head}%.3f")
    }
    med("warmup")(q05(sf01))
    med("a_q05_sf0.1_constant")(q05(sf01))
    med("b_q05_sf10")(q05(sf10))
    med("c_bare_agg_sf10")(bare(sf10))
    graft.operators.NamedQuery.withConf(spark,
      Map("spark.sql.files.maxPartitionBytes" -> "8g",
        "spark.sql.files.openCostInBytes" -> "1g")) {
      med("d_q05_sf10_single_task")(q05(sf10))
    }
    Seq("256m", "512m", "1g", "2g").foreach { mpb =>
      graft.operators.NamedQuery.withConf(spark,
        Map("spark.sql.files.maxPartitionBytes" -> mpb)) {
        med(s"e_q05_sf10_$mpb")(q05(sf10))
      }
    }
    spark.stop()
  }
}
