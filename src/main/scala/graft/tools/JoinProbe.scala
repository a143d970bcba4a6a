package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t

/** Round-12 stage accounting (VERDICT r11 item 4): decompose the three
  * unbucketed fact-join queries that sit above the 2× DuckDB envelope
  * at sf10 — q12 (2.8×), q68 (3.9×), q69 (5.5×) — the way q97/q05
  * were. Each prefix is a runnable plan; successive deltas attribute
  * wall time to the stage added. Then A/B the candidate levers:
  *
  *  - runtime bloom-filter pushdown (q68/q69: the SHJ build side is
  *    selective — BUILDING customers / ASIA suppliers — so a bloom on
  *    the fact side's join key could cut the l_orderkey exchange ~5×;
  *    Spark gates it on application-side scan size ≥ 10 GB, which
  *    sf10's ~1.6 GB lineitem never meets, so the probe lowers the
  *    gate explicitly)
  *  - q12 segment-early: attach c_mktsegment to orders BEFORE the fact
  *    join so the SHJ build carries (o_orderkey, segment) and the
  *    final aggregation needs no second join
  *  - AQE wide-then-coalesce on the big exchanges (the q173 profile)
  */
object JoinProbe {
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
      .config("spark.driver.memory", "16g")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.DuckAliases.register(spark)

    def run(name: String, mk: () => DataFrame, warm: Boolean = true): Double = {
      if (warm) mk().write.mode("overwrite").format("noop").save()
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        mk().write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      val med = times(times.size / 2)
      println(f"[jp] $name%-28s med $med%6.3f min ${times.head}%6.3f " +
        f"max ${times.last}%6.3f")
      med
    }
    def exchanges(df: DataFrame): Int =
      "Exchange hashpartitioning".r
        .findAllIn(df.queryExecution.executedPlan.toString).size
    def hasBloom(df: DataFrame): Boolean =
      df.queryExecution.optimizedPlan.toString.contains("bloom_filter")

    // ---------------- q12 prefixes ----------------
    def liScan12 = t(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_extendedprice", "l_discount")
    def preAgg12 = liScan12.groupBy("l_orderkey")
      .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount")))
        .as("rev"))
    def ordersJoin12 = preAgg12.join(
      t(spark, sfDir, "orders").select("o_orderkey", "o_custkey")
        .hint("shuffle_hash"),
      col("l_orderkey") === col("o_orderkey"))
    def full12 = graft.SparkEntry.queries("q12_join_agg")(spark, sfDir)

    // q12 lever: segment-early — broadcast customer into ORDERS before
    // the fact join; the SHJ build carries (o_orderkey, segment) and
    // the plan drops the post-join broadcast entirely
    def segEarly12 = {
      val o2 = t(spark, sfDir, "orders").select("o_orderkey", "o_custkey")
        .join(broadcast(t(spark, sfDir, "customer")
          .select("c_custkey", "c_mktsegment")),
          col("o_custkey") === col("c_custkey"))
        .select("o_orderkey", "c_mktsegment")
      preAgg12.join(o2.hint("shuffle_hash"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("c_mktsegment")
        .agg(round(sum(col("rev")), 2).as("revenue"),
          count(lit(1)).as("n_orders"))
    }

    // ---------------- q68 prefixes ----------------
    def liScan68 = t(spark, sfDir, "lineitem")
      .filter(col("l_shipdate") > lit("1998-01-01").cast("timestamp"))
      .select("l_orderkey", "l_extendedprice", "l_discount")
    def oc68 = t(spark, sfDir, "orders")
      .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      .join(broadcast(t(spark, sfDir, "customer")
        .filter(col("c_mktsegment") === "BUILDING")),
        col("o_custkey") === col("c_custkey"))
      .select("o_orderkey", "o_orderdate", "o_orderpriority")
    def shj68 = liScan68.join(oc68.hint("shuffle_hash"),
      col("l_orderkey") === col("o_orderkey"))
    def full68 = graft.SparkEntry.queries("q68_tpch_q3")(spark, sfDir)

    // ---------------- q69 prefixes ----------------
    val r = t(spark, sfDir, "region").filter(col("r_name") === "ASIA")
    val asiaN = t(spark, sfDir, "nation")
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .select("n_nationkey", "n_name")
    def suA = t(spark, sfDir, "supplier")
      .join(broadcast(asiaN), col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey", "s_nationkey")
    def cA = t(spark, sfDir, "customer")
      .join(broadcast(asiaN), col("c_nationkey") === col("n_nationkey"))
      .select("c_custkey", "c_nationkey")
    def liScan69 = t(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    def oScan69 = t(spark, sfDir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp")
        && col("o_orderdate") < lit("1999-01-01").cast("timestamp"))
      .select("o_orderkey", "o_custkey")
    def liPruned69 = liScan69
      .join(broadcast(suA), col("l_suppkey") === col("s_suppkey"))
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"),
        col("s_nationkey"))
    def shj69 = liPruned69.join(oScan69.hint("shuffle_hash"),
      col("l_orderkey") === col("o_orderkey"))
    def full69 = graft.SparkEntry.queries("q69_tpch_q5")(spark, sfDir)

    println(s"[jp] sfDir=$sfDir reps=$reps")
    // load sentinel (same contract as Bench): a fixed tiny job, timed
    def sentinel(): Double = {
      val t0 = System.nanoTime()
      spark.range(1L << 22).select(sum("id")).collect()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"[jp] sentinel_start ${sentinel()}%6.3f")

    val stages: Seq[(String, () => DataFrame)] = Seq(
      "q12_p1_li_scan" -> (() => liScan12),
      "q12_p2_preagg" -> (() => preAgg12),
      "q12_p3_orders_shj" -> (() => ordersJoin12),
      "q12_p4_full" -> (() => full12),
      "q68_p1_li_scan" -> (() => liScan68),
      "q68_p2_oc_bjoin" -> (() => oc68),
      "q68_p3_shj" -> (() => shj68),
      "q68_p4_full" -> (() => full68),
      "q69_p1_li_scan" -> (() => liScan69),
      "q69_p2_orders_scan" -> (() => oScan69),
      "q69_p3_li_pruned" -> (() => liPruned69),
      "q69_p4_shj" -> (() => shj69),
      "q69_p5_full" -> (() => full69))
    stages.foreach { case (n, mk) => run(n, mk) }
    println(f"[jp] sentinel_mid ${sentinel()}%6.3f")

    // ---------------- levers ----------------
    println(s"[jp] q12_segEarly exchanges=${exchanges(segEarly12)}")
    run("q12_L_segEarly", () => segEarly12)
    val sameSeg = segEarly12.collect().map(_.toString).sorted.toSeq ==
      full12.collect().map(_.toString).sorted.toSeq
    println(s"[jp] q12_segEarly identical=$sameSeg")

    // bloom-filter pushdown: lower the application-side gate so the
    // selective SHJ build sides inject a bloom on the fact join key
    spark.conf.set(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "64MB")
    println(s"[jp] bloom68=${hasBloom(shj68)} bloom69=${hasBloom(shj69)} " +
      s"bloom12=${hasBloom(ordersJoin12)}")
    run("q68_L_bloom", () => full68)
    run("q69_L_bloom", () => full69)
    run("q12_L_bloom", () => full12)
    spark.conf.set(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "10GB")

    // AQE wide-then-coalesce (q173 profile) on the fact exchanges
    spark.conf.set("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
      "256")
    run("q12_L_aqe256", () => full12)
    run("q68_L_aqe256", () => full68)
    run("q69_L_aqe256", () => full69)
    spark.conf.unset("spark.sql.adaptive.coalescePartitions.initialPartitionNum")

    println(f"[jp] sentinel_end ${sentinel()}%6.3f")
    spark.stop()
  }
}
