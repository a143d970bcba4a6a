package graft.tools

import org.apache.spark.sql.SparkSession

/** Runtime-filter A/B on the ad-hoc fact joins (VERDICT r16 #2):
  * q12/q68/q69 are broadcast-pruned but still scan the full 60 M-row
  * lineitem; Spark's runtime bloom filter can seed the fact side from
  * the dimension side's date/flag filters before the join. Spark's
  * injection gates sit at warehouse scale by default
  * (applicationSideScanSizeThreshold = 10 GB), so the A/B opens them
  * and reports whether a bloom actually injects and what it buys at
  * the sf10 tier. Usage: runMain graft.tools.RuntimeFilterProbe <sfDir>
  */
object RuntimeFilterProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/benchdata/sf10")
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
    def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val queries = Seq("q12_join_agg", "q68_tpch_q3", "q69_tpch_q5")
    def run(name: String): Unit =
      graft.operators.NamedQuery.withConf(spark,
        graft.SparkEntry.queryConf.getOrElse(name, Map.empty)) {
        graft.SparkEntry.queries(name)(spark, sfDir)
          .write.mode("overwrite").format("noop").save()
      }
    def planOf(name: String): String =
      graft.operators.NamedQuery.withConf(spark,
        graft.SparkEntry.queryConf.getOrElse(name, Map.empty)) {
        val df = graft.SparkEntry.queries(name)(spark, sfDir)
        df.write.mode("overwrite").format("noop").save()
        org.apache.spark.sql.classic.ClassicConversions.castToImpl(df)
          .queryExecution.executedPlan.toString
      }

    // semiJoinReduction was REMOVED in Spark 4.0 (runtime filters can
    // no longer be IN subqueries), so bloom is the only runtime-filter
    // lever; defaults repeat last as a drift control
    val variants = Seq(
      "defaults" -> Map.empty[String, String],
      "bloom_open" -> Map(
        "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "256MB"),
      "defaults_again" -> Map.empty[String, String])

    queries.foreach(run) // warm codegen + data cache once
    for ((tag, confs) <- variants) {
      val prev = confs.keys.map(k =>
        k -> spark.conf.getOption(k)).toMap
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      try {
        for (q <- queries) {
          val plan = planOf(q)
          val injected = plan.contains("bloom") ||
            plan.contains("might_contain")
          val t = med((1 to 5).map(_ => time(run(q))))
          println(f"[rfprobe] $sfDir $tag%-14s $q%-16s med5=$t%.3f s " +
            f"runtime_filter=$injected")
        }
      } finally prev.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
    spark.stop()
  }
}
