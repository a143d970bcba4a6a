package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Interleaved AQE on/off A/B for the tiny-exchange scan-agg queries
  * (q05/q06) + q155 construction-vs-execution split. Interleaving
  * removes the order effects that made earlier probes disagree. */
object AqeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "benchdata/sf10")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPEATS", "7").toInt
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
    graft.operators.BucketedOps.warmLayout(spark, sfDir)

    def q(name: String) = graft.SparkEntry.queries(name)
    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    def save(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    // warmup
    Seq("q05_agg_global", "q06_tpch_q1", "q155_tpch_q3_bucketed")
      .foreach(n => save(q(n)(spark, sfDir)))

    val acc = scala.collection.mutable.Map
      .empty[String, Vector[Double]].withDefaultValue(Vector.empty)
    (1 to reps).foreach { _ =>
      Seq(true, false).foreach { aqe =>
        spark.conf.set("spark.sql.adaptive.enabled", aqe.toString)
        val tag = if (aqe) "aqe" else "noaqe"
        Seq("q05_agg_global", "q06_tpch_q1").foreach { n =>
          acc(s"${n}_$tag") :+= time(save(q(n)(spark, sfDir)))
        }
      }
      // q155/q156: split construction (driver-side plan build incl.
      // maybeBroadcast stats) from execution; q156 also A/Bs the
      // clearCache-per-repeat discipline Bench applies
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      var df: DataFrame = null
      acc("q155_construct") :+= time {
        df = q("q155_tpch_q3_bucketed")(spark, sfDir)
      }
      acc("q155_execute") :+= time(save(df))
      spark.conf.set("spark.sql.requireAllClusterKeysForCoPartition",
        "false")
      var df6: DataFrame = null
      acc("q156_construct") :+= time {
        df6 = q("q156_tpch_q5_bucketed")(spark, sfDir)
      }
      acc("q156_execute") :+= time(save(df6))
      acc("q156_full_clearcache") :+= time {
        save(q("q156_tpch_q5_bucketed")(spark, sfDir))
        spark.catalog.clearCache()
      }
      spark.conf.set("spark.sql.requireAllClusterKeysForCoPartition",
        "true")
      spark.conf.set("spark.sql.adaptive.enabled", "true")
    }
    acc.toSeq.sortBy(_._1).foreach { case (k, v) =>
      val s = v.sorted
      println(f"[aqe] $k%-22s med ${s(s.size / 2)}%6.3f " +
        f"min ${s.head}%6.3f max ${s.last}%6.3f")
    }
    spark.stop()
  }
}
