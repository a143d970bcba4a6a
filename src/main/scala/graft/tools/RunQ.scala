package graft.tools

import org.apache.spark.sql.SparkSession

/** Timed standalone runner matching Bench's session shape (tier-scaled
  * shuffle partitions, tier-adaptive codec, per-query execution
  * profiles applied): `runMain graft.tools.RunQ <sfDir> <query>...`
  * with SPARK_GRAFT_REPEATS repeats (default 3), medians printed.
  * Shared corpus stages (shingle index) warm untimed first, like
  * Bench. */
object RunQ {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val names = args.tail
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPEATS", "3").toInt
    val tierBytes = {
      val dir = java.nio.file.Paths.get(sfDir)
      if (!java.nio.file.Files.isDirectory(dir)) 0L
      else {
        val s = java.nio.file.Files.walk(dir)
        try s.filter(java.nio.file.Files.isRegularFile(_))
          .mapToLong(java.nio.file.Files.size(_)).sum()
        finally s.close()
      }
    }
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE",
          math.max(32L, math.min(2048L, tierBytes / (128L << 20) + 1)).toString))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.files.maxPartitionBytes", "32m")
      .config("spark.cleaner.periodicGC.interval", "2min")
      .config("spark.io.compression.codec",
        if (tierBytes >= (4L << 30)) "zstd" else "lz4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.DuckAliases.register(spark)
    def once(name: String, dir: String): Double = {
      val t0 = System.nanoTime()
      graft.operators.NamedQuery.withConf(spark,
        graft.SparkEntry.queryConf.getOrElse(name, Map.empty)) {
        graft.SparkEntry.benchOverrides
          .getOrElse(name, graft.SparkEntry.queries(name))
          .apply(spark, dir)
          .write.mode("overwrite").format("noop").save()
      }
      (System.nanoTime() - t0) / 1e9
    }
    names.foreach { name =>
      graft.SparkEntry.benchSharedStages.get(name).foreach {
        case (stage, warm) =>
          val t0 = System.nanoTime()
          warm(spark, sfDir)
          println(f"[runq] $stage%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      }
      once(name, "/root/testdata/sf0.001") // codegen warmup
      val ts = (1 to reps).map { _ =>
        val t = once(name, sfDir)
        spark.catalog.clearCache()
        graft.SparkEntry.benchSharedStages.get(name)
          .foreach { case (_, warm) => warm(spark, sfDir) }
        t
      }.sorted
      println(f"[runq] $name%-28s med ${ts(ts.size / 2)}%8.2f " +
        f"min ${ts.head}%8.2f max ${ts.last}%8.2f")
    }
    spark.stop()
  }
}
