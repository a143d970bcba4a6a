package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** q41 variance attribution (r7 verdict task 5): the sf10 spread
  * [14.2, 26.9] was hypothesized to be GC pressure during the
  * 2.8 M-candidate verify stage. This probe runs q41 `repeats` times
  * with a stage listener and reports, per repeat, total executor task
  * time vs JVM GC time (overall and for the heaviest stage), so the
  * spread decomposes into work vs collector. Optional off-heap mode
  * (SPARK_GRAFT_OFFHEAP=8g) moves execution memory off the JVM heap
  * for an A/B comparison.
  * Usage: SPARK_GRAFT_SF_DIR=benchdata/sf10 runMain graft.tools.Gc41Probe
  */
object Gc41Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "benchdata/sf10")
    val repeats = sys.env.getOrElse("SPARK_GRAFT_REPEATS", "5").toInt
    val offHeap = sys.env.get("SPARK_GRAFT_OFFHEAP")
    val b = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.files.maxPartitionBytes", "32m")
      .config("spark.ui.enabled", "false")
    offHeap.foreach { sz =>
      b.config("spark.memory.offHeap.enabled", "true")
        .config("spark.memory.offHeap.size", sz)
    }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.DuckAliases.register(spark)

    @volatile var stages =
      List.empty[(Int, String, Long, Long)] // id, name, runMs, gcMs
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val m = e.stageInfo.taskMetrics
        stages ::= ((e.stageInfo.stageId, e.stageInfo.name.take(40),
          m.executorRunTime, m.jvmGCTime))
      }
    })

    println(s"[gc41] offHeap=${offHeap.getOrElse("off")} sf=$sfDir")
    // warmup (codegen) on the tiny sf
    graft.SparkEntry.queries("q41_dedup_ngram_jaccard")(
      spark, "/root/testdata/sf0.001")
      .write.mode("overwrite").format("noop").save()
    (1 to repeats).foreach { i =>
      graft.operators.DedupOps.warmShingles(spark, sfDir)
      stages = Nil
      val t0 = System.nanoTime()
      graft.SparkEntry.queries("q41_dedup_ngram_jaccard")(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
      val wall = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      val run = stages.map(_._3).sum
      val gc = stages.map(_._4).sum
      val hot = stages.sortBy(-_._3).headOption
        .map { case (id, n, r, g) => s"stage$id($n) run=${r}ms gc=${g}ms" }
        .getOrElse("-")
      println(f"[gc41] repeat$i wall=$wall%6.2f s  taskRun=${run}ms " +
        f"gc=${gc}ms (${100.0 * gc / math.max(1, run)}%.1f%%)  hot: $hot")
    }
    spark.stop()
  }
}
