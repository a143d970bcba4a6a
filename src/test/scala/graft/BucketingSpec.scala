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
}
