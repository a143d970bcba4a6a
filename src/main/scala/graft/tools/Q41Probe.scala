package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** q41 decade attribution (VERDICT r11 item 6): the sf10→sf100 growth
  * was 7.3×/decade. This probe decomposes the pair-verify pipeline at a
  * tier into its stages and prints the ANALYTIC drivers alongside the
  * wall times, so the superlinear term is attributed to data shape vs
  * plan hazard the way q138's was:
  *
  *  - index rows, distinct shingles, distinct docs (linear at ~10×?)
  *  - Σ df·(df−1)/2 over the df-capped index = EXACT pair-stream
  *    cardinality entering the groupBy — if this grows >10×/decade the
  *    superlinearity is corpus shape (duplicate-cluster df growth),
  *    not the plan
  *  - per-phase wall time: size agg, pair join+groupBy, size joins
  *  - per-stage shuffle bytes via a stage listener
  *
  * Usage: runMain graft.tools.Q41Probe <sfDir> */
object Q41Probe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("benchdata/sf10")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE",
          math.max(32L, new java.io.File(d).listFiles
            .map(f => Option(f.listFiles).map(_.map(_.length).sum)
              .getOrElse(f.length)).sum / (128L << 20) + 1).toString))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.files.maxPartitionBytes", "32m")
      .config("spark.cleaner.periodicGC.interval", "2min")
      .config("spark.io.compression.codec",
        if (d.contains("sf100")) "zstd" else "lz4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    @volatile var stageRows = List.empty[(String, Long, Long, Long)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val m = si.taskMetrics
        stageRows = (si.name.take(40), m.executorRunTime,
          m.shuffleWriteMetrics.bytesWritten,
          m.shuffleReadMetrics.remoteBytesRead +
            m.shuffleReadMetrics.localBytesRead) :: stageRows
      }
    })
    def phase[A](label: String)(f: => A): A = {
      stageRows = Nil
      val t0 = System.nanoTime()
      val r = f
      val dt = (System.nanoTime() - t0) / 1e9
      org.apache.spark.GraftSparkBridge.waitForListeners(spark.sparkContext)
      println(f"[q41] $label%-22s $dt%7.1f s")
      stageRows.reverse.foreach { case (n, rt, w, rd) =>
        println(f"[q41]   stage $n%-40s run ${rt / 1000.0}%9.1f s·core " +
          f"wr ${w >> 20}%6d MB rd ${rd >> 20}%6d MB")
      }
      r
    }

    println(s"[q41] tier $d shuffle=" +
      spark.conf.get("spark.sql.shuffle.partitions"))
    val sh = graft.operators.DedupOps.sharedShingles(spark, d)
    phase("shingle_stage") {
      sh.write.mode("overwrite").format("noop").save()
    }
    phase("index_stats") {
      val r = sh.agg(count(lit(1)).as("rows"),
        approx_count_distinct(col("s")).as("shingles"),
        approx_count_distinct(col("doc_id")).as("docs")).head
      println(s"[q41]   rows=${r.getLong(0)} shingles~${r.getLong(1)} " +
        s"docs~${r.getLong(2)}")
    }
    phase("pair_stream_card") {
      // exact pair-stream cardinality: Σ df·(df−1)/2 over the index
      val r = sh.groupBy("s").agg(count(lit(1)).as("df"))
        .agg(sum(col("df") * (col("df") - 1) / 2).as("pairs"),
          max("df").as("max_df")).head
      println(s"[q41]   pair_stream=${r.get(0)} max_df=${r.get(1)}")
    }
    phase("size_agg") {
      sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
        .write.mode("overwrite").format("noop").save()
    }
    val a = sh.toDF("id_a", "s"); val b = sh.toDF("id_b", "s")
    phase("pair_join_groupby") {
      val pairs = a.join(b, Seq("s")).filter(col("id_a") < col("id_b"))
        .groupBy("id_a", "id_b").agg(count(lit(1)).as("inter"))
      println(s"[q41]   distinct_pairs=${pairs.count()}")
    }
    phase("full_q41") {
      graft.SparkEntry.queries("q41_dedup_ngram_jaccard")(spark, d)
        .write.mode("overwrite").format("noop").save()
    }
    spark.stop()
  }
}
