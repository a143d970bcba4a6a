package graft

import java.nio.file.Files

import org.apache.spark.sql.classic.ClassicConversions.castToImpl
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

/** Co-located joins via bucketing: two tables bucketed on the join key
  * join WITHOUT a shuffle — the pre-partitioning strategy that replaces
  * repeated fact-fact shuffles at 100 TB. */
class BucketingSpec extends SparkSpec {

  test("bucketed tables join without exchanges") {
    // warehouse.dir is a static conf — bucketed tables land in the
    // default ./spark-warehouse and are dropped (managed) afterwards
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    val li = Tables.t(spark, sf, "lineitem")
    val o = Tables.t(spark, sf, "orders")
    val tli = s"b_li_${System.nanoTime()}"
    val to = s"b_o_${System.nanoTime()}"
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable(tli)
    o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable(to)
    try {
      val joined = spark.table(tli)
        .join(spark.table(to), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus")
        .agg(round(sum("l_quantity"), 2).as("qty"))
      joined.collect()
      val plan = castToImpl(joined).queryExecution.executedPlan
      val exchanges = plan.collect {
        case e: ShuffleExchangeExec => Seq(e)
        case a: AdaptiveSparkPlanExec => a.executedPlan.collect {
          case e: ShuffleExchangeExec => e
        }
      }.flatten
      // the JOIN itself must be shuffle-free (bucket co-location); only
      // the final single-column aggregation may exchange
      assert(exchanges.size <= 1, s"join shuffled: ${exchanges.size} exchanges")
      // sanity: result matches the unbucketed formulation
      val plain = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus")
        .agg(round(sum("l_quantity"), 2).as("qty"))
      assert(joined.exceptAll(plain).count() == 0)
      assert(plain.exceptAll(joined).count() == 0)
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $tli")
      spark.sql(s"DROP TABLE IF EXISTS $to")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    }
  }

  test("AQE splits skewed shuffle-join partitions at runtime") {
    // force a sort-merge join and make one shuffle partition ~90% of the
    // data; with tuned thresholds AQE must split it (AQEShuffleRead with
    // skewed spec) instead of letting one task carry the hot key
    val restore = Map(
      "spark.sql.autoBroadcastJoinThreshold" -> "10485760",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "256MB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64MB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "5.0")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
    spark.conf.set(
      "spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
    spark.conf.set(
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
    try {
      val left = spark.range(300000)
        .select(when(col("id") % 10 =!= 0, 7L).otherwise(col("id")).as("k"),
          col("id").as("v"))
      val right = spark.range(5000)
        .select(col("id").as("k"), col("id").as("w"))
      val joined = left.join(right, Seq("k"))
      // execute THIS dataframe's plan so its adaptive plan finalizes
      // (hot key 7: 270k rows; ids divisible by 10 under 5000: 500 rows)
      assert(joined.collect().length == 270500)
      val plan = castToImpl(joined).queryExecution.executedPlan.collect {
        case a: AdaptiveSparkPlanExec => a.executedPlan.toString
      }.mkString("\n")
      assert(plan.contains("skew"),
        s"AQE did not split the skewed partition:\n$plan")
    } finally restore.foreach { case (k, v) => spark.conf.set(k, v) }
  }
}
