package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t

/** JoinProbe round 2: the levers the first decomposition pointed at.
  *
  *  - q12: the pre-aggregation stage alone is 4.2 s of the 5.4 s query
  *    (79%). Its keys are near-unique per input partition (each
  *    l_orderkey's ~4 rows scatter across all 32 input partitions), so
  *    the pre-shuffle partial aggregate builds a ~1.8 M-entry hash map
  *    per partition and reduces almost nothing — the q42-sf100
  *    pathology (repartition raw rows BEFORE a per-key aggregation
  *    whose partial pass cannot reduce). A/B: exchange the raw
  *    16-byte (key, rev) rows first, then aggregate clustered.
  *  - bloom-filter pushdown retry with the full config set: enabled
  *    explicitly, creation-side threshold raised (the oc build side is
  *    a JOIN whose size estimate exceeds the 10 MB default), app-side
  *    scan gate lowered.
  */
object JoinProbe2 {
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

    def run(name: String, mk: () => DataFrame): Double = {
      mk().write.mode("overwrite").format("noop").save()
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        mk().write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      val med = times(times.size / 2)
      println(f"[jp2] $name%-28s med $med%6.3f min ${times.head}%6.3f " +
        f"max ${times.last}%6.3f")
      med
    }
    def sentinel(): Double = {
      val t0 = System.nanoTime()
      spark.range(1L << 22).selectExpr("sum(id)").collect()
      (System.nanoTime() - t0) / 1e9
    }

    def liRaw = t(spark, sfDir, "lineitem")
      .select(col("l_orderkey"),
        (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("r0"))
    // A: status quo — partial agg on scattered keys, then exchange
    def preA = liRaw.groupBy("l_orderkey").agg(sum(col("r0")).as("rev"))
    // B: exchange the raw 16-byte rows first, aggregate clustered
    def preB = liRaw.repartition(col("l_orderkey"))
      .groupBy("l_orderkey").agg(sum(col("r0")).as("rev"))
    def o2 = t(spark, sfDir, "orders").select("o_orderkey", "o_custkey")
      .join(broadcast(t(spark, sfDir, "customer")
        .select("c_custkey", "c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .select("o_orderkey", "c_mktsegment")
    def q12Of(pre: => DataFrame) = pre.join(o2.hint("shuffle_hash"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("c_mktsegment")
      .agg(round(sum(col("rev")), 2).as("revenue"),
        count(lit(1)).as("n_orders"))

    println(f"[jp2] sentinel_start ${sentinel()}%6.3f")
    run("q12_preagg_A_statusquo", () => preA)
    run("q12_preagg_B_repart", () => preB)
    run("q12_full_A", () => q12Of(preA))
    run("q12_full_B", () => q12Of(preB))
    val same = q12Of(preB).collect().map(_.toString).sorted.toSeq ==
      graft.SparkEntry.queries("q12_join_agg")(spark, sfDir)
        .collect().map(_.toString).sorted.toSeq
    println(s"[jp2] q12_B identical=$same")

    // bloom retry, full config set
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    spark.conf.set(
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "512MB")
    spark.conf.set(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "64MB")
    def hasBloom(df: DataFrame): Boolean =
      df.queryExecution.optimizedPlan.toString.contains("bloom_filter")
    def full68 = graft.SparkEntry.queries("q68_tpch_q3")(spark, sfDir)
    def full69 = graft.SparkEntry.queries("q69_tpch_q5")(spark, sfDir)
    println(s"[jp2] bloom68=${hasBloom(full68)} bloom69=${hasBloom(full69)}")
    if (hasBloom(full68)) run("q68_L_bloom2", () => full68)
    if (hasBloom(full69)) run("q69_L_bloom2", () => full69)
    println(f"[jp2] sentinel_end ${sentinel()}%6.3f")
    spark.stop()
  }
}
