package graft.tools

import org.apache.spark.sql.SparkSession

/** Scan-throughput sweep for the scan-bound basket queries (dev tool):
  * times a query under several `spark.sql.files.maxPartitionBytes`
  * settings. The bench tiers write fact tables as 32×~44 MB files; the
  * 128 MB default packs ~3 files per scan task, so a 32-core host runs
  * the scan at ~1/3 parallelism. maxPartitionBytes is a runtime SQL
  * conf — swept in-session, median-of-5 per setting. */
object Sweep06 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "benchdata/sf10")
    val names = if (args.nonEmpty) args.toSeq else Seq("q06_tpch_q1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.DuckAliases.register(spark)
    val settings = Seq("128m", "44m", "32m", "16m", "8m")
    names.foreach { name =>
      // warmup (codegen + page cache)
      SparkEntryRun(spark, name, sfDir)
      settings.foreach { mpb =>
        spark.conf.set("spark.sql.files.maxPartitionBytes", mpb)
        val times = (1 to 5).map { _ =>
          val t0 = System.nanoTime()
          SparkEntryRun(spark, name, sfDir)
          spark.catalog.clearCache()
          (System.nanoTime() - t0) / 1e9
        }.sorted
        println(f"[sweep] $name%-20s mpb=$mpb%-5s " +
          f"median=${times(2)}%6.3f s  min=${times.head}%6.3f  " +
          f"max=${times.last}%6.3f")
      }
    }
    spark.stop()
  }

  private def SparkEntryRun(spark: SparkSession, name: String,
      sfDir: String): Unit =
    graft.SparkEntry.queries(name)(spark, sfDir)
      .write.mode("overwrite").format("noop").save()
}
