package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs the headline queries against
  * SPARK_GRAFT_SF_DIR (default sf0.1) and prints ONE JSON line. Each
  * query is fully materialized through a noop sink (count() would let
  * Catalyst prune the compute columns). */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // optional comma-separated subset (scale-tier runs time only the
    // heavyweights)
    val wanted = sys.env.get("SPARK_GRAFT_QUERIES")
      .map(_.split(",").map(_.trim).toSet)
    val benchSet = SparkEntry.benchQueries
      .filter(q => wanted.forall(_.contains(q)))
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.DuckAliases.register(spark)
    // JVM + codegen warmup on the smallest sf, so measured numbers are the
    // steady-state throughput a long-lived cluster session would see.
    benchSet.foreach { name =>
      try SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
        .write.mode("overwrite").format("noop").save()
      catch { case _: Throwable => () }
    }
    // best-of-3: single-shot timings on a shared host are ±3x noisy
    // (GC + contention); the minimum is the steady-state throughput
    val results = benchSet.map { name =>
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        try SparkEntry.queries(name)(spark, sfDir)
          .write.mode("overwrite").format("noop").save()
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
        }
        // drop per-invocation operator caches: a cache carried across
        // repeats would measure cache hits, not the operator
        finally spark.catalog.clearCache()
        (System.nanoTime() - t0) / 1e9
      }
      name -> times.min
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
