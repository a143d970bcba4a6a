package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables.t
import graft.operators.{BucketedOps, NamedQuery}

/** Stage accounting for the bucketed fact-join variants (BENCH_NOTES
  * round-8 floor analysis): times the one-time layout write, then
  * median-of-3 stage prefixes of q155/q156 so the residual cost above
  * DuckDB decomposes into (scan, broadcast-prune, bucketed join, agg).
  * Usage: SPARK_GRAFT_SF_DIR=benchdata/sf10 runMain graft.tools.BucketProbe
  */
object BucketProbe {
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
    def med3(mk: => org.apache.spark.sql.DataFrame, label: String): Unit = {
      val ts = (1 to 3).map { _ =>
        time(mk.write.mode("overwrite").format("noop").save())
      }.sorted
      println(f"[bucketprobe] $label%-22s ${ts(1)}%6.2f s  " +
        f"[${ts.head}%.2f, ${ts.last}%.2f]")
    }

    // one-time layout cost (fresh pid → fresh write)
    val layout = time(BucketedOps.warmLayout(spark, sfDir))
    println(f"[bucketprobe] layout_write        $layout%6.2f s (once per snapshot)")
    val (tli, to) = BucketedOps.factPair(spark, sfDir)

    // q155 prefixes
    val li155 = spark.table(tli)
      .filter(col("l_shipdate") > lit("1998-01-01").cast("timestamp"))
      .select("l_orderkey", "l_extendedprice", "l_discount")
    med3(li155, "q155_p1_li_scan")
    def oc155 = spark.table(to)
      .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      .join(NamedQuery.maybeBroadcast(
          t(spark, sfDir, "customer")
            .filter(col("c_mktsegment") === "BUILDING"),
          t(spark, sfDir, "customer"), 100L << 20),
        col("o_custkey") === col("c_custkey"))
      .select("o_orderkey", "o_orderdate", "o_orderpriority")
    med3(oc155, "q155_p2_orders_cust")
    med3(graft.SparkEntry.queries("q155_tpch_q3_bucketed")(spark, sfDir),
      "q155_full")

    // q156 prefixes
    val li156 = spark.table(tli)
      .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    med3(li156, "q156_p1_li_scan")
    val r = t(spark, sfDir, "region").filter(col("r_name") === "ASIA")
    val asiaN = t(spark, sfDir, "nation")
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .select("n_nationkey", "n_name")
    val suA = t(spark, sfDir, "supplier")
      .join(broadcast(asiaN), col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey", "s_nationkey")
    def liSup = li156.join(
      NamedQuery.maybeBroadcast(suA, t(spark, sfDir, "supplier"), 100L << 20),
      col("l_suppkey") === col("s_suppkey"))
    med3(liSup, "q156_p2_li_supplier")
    def liSupOrd = liSup.join(
      spark.table(to)
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp")
          && col("o_orderdate") < lit("1999-01-01").cast("timestamp"))
        .select("o_orderkey", "o_custkey"),
      col("l_orderkey") === col("o_orderkey"))
    med3(liSupOrd, "q156_p3_fact_join")
    med3(graft.SparkEntry.queries("q156_tpch_q5_bucketed")(spark, sfDir),
      "q156_full")

    spark.stop()
  }
}
