package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the System.gc() pause q42 pays inside its timed path
  * (stageCandidates forces a full GC after staging so the generation
  * lineage's shuffle files are reclaimable before verification spills
  * — a decade-tier disk defense) against the q42 run it lives in. */
object GcCostProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.files.maxPartitionBytes", "32m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.DuckAliases.register(spark)
    import graft.operators.DedupOps
    DedupOps.warmShingles(spark, sfDir)
    (1 to 3).foreach { rep =>
      val t1 = System.nanoTime()
      graft.SparkEntry.queries("q42_dedup_minhash_lsh")(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
      val dq = (System.nanoTime() - t1) / 1e9
      val t0 = System.nanoTime()
      System.gc()
      val dgc = (System.nanoTime() - t0) / 1e9
      println(f"[gc] [$rep] q42=$dq%6.3f s  extra System.gc()=$dgc%6.3f s")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
