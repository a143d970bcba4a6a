package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t
import graft.operators.BucketedOps

/** Round-10 stage accounting (VERDICT r9 item 5): attribute q155/q156's
  * residual to stages shared with q06's scan constant, and measure the
  * AQE-barrier cost on the exchange-free bucketed plans. Each prefix is
  * a runnable plan; successive deltas attribute wall time. */
object StageAccount {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "benchdata/sf10")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPEATS", "5").toInt
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
    BucketedOps.warmLayout(spark, sfDir)
    val (tli, to) = BucketedOps.factPair(spark, sfDir)

    def liScan156 = spark.table(tli)
      .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    def oScan156 = spark.table(to)
      .filter(col("o_year").between(1996, 1998)
        && col("o_orderdate") >= lit("1996-01-01").cast("timestamp")
        && col("o_orderdate") < lit("1999-01-01").cast("timestamp"))
      .select("o_orderkey", "o_custkey")
    def liScan155 = spark.table(tli)
      .filter(col("l_shipdate") > lit("1998-01-01").cast("timestamp"))
      .select("l_orderkey", "l_extendedprice", "l_discount")
    def q06Scan = t(spark, sfDir, "lineitem")
      .select("l_returnflag", "l_linestatus", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax")

    val variants: Seq[(String, () => DataFrame)] = Seq(
      "s_li156_scan" -> (() => liScan156),
      "s_o156_scan" -> (() => oScan156),
      "s_li155_scan" -> (() => liScan155),
      "s_q06_scan" -> (() => q06Scan),
      "full_q06" -> (() =>
        graft.SparkEntry.queries("q06_tpch_q1")(spark, sfDir)),
      "full_q155" -> (() =>
        graft.SparkEntry.queries("q155_tpch_q3_bucketed")(spark, sfDir)),
      "full_q156" -> (() =>
        graft.SparkEntry.queries("q156_tpch_q5_bucketed")(spark, sfDir)))

    def run(name: String, mk: () => DataFrame): Unit = {
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        mk().write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"[stage] $name%-16s med ${times(times.size / 2)}%6.3f " +
        f"min ${times.head}%6.3f max ${times.last}%6.3f")
    }

    variants.foreach { case (_, mk) =>
      mk().write.mode("overwrite").format("noop").save()
    }
    variants.foreach { case (n, mk) => run(n, mk) }
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    Seq("full_q155_noaqe" -> variants(5)._2,
      "full_q156_noaqe" -> variants(6)._2,
      "full_q06_noaqe" -> variants(4)._2).foreach { case (n, mk) =>
      mk().write.mode("overwrite").format("noop").save(); run(n, mk)
    }
    spark.stop()
  }
}
