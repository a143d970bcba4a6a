package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B for q173's execution profile: the shipped conf starts EVERY
  * shuffle of the query at 1024 partitions (tuned on the sf100
  * distinct-keyspace aggregation) and lets AQE coalesce — what does
  * that cost at the small tiers, and does an explicit data-derived
  * repartition on the aggregation input alone match it? */
object Q173Probe2 {
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
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[q173] $label%-34s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    val fn = graft.SparkEntry.queries("q173_substring_spans")
    val conf = graft.SparkEntry.queryConf
      .getOrElse("q173_substring_spans", Map.empty[String, String])
    (1 to 3).foreach { rep =>
      time(s"[$rep] A: shipped conf (init 1024)") {
        graft.operators.NamedQuery.withConf(spark, conf) {
          fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        }
      }
      time(s"[$rep] B: no conf (session width)") {
        fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      }
      val derived = math.max(cpus.toInt.toLong,
        graft.operators.NamedQuery.footprintOf(sfDir, "documents") /
          (512L << 10)).min(4096L).toString
      time(s"[$rep] C: init=derived ($derived)") {
        graft.operators.NamedQuery.withConf(spark, Map(
          "spark.sql.adaptive.coalescePartitions.initialPartitionNum"
            -> derived)) {
          fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        }
      }
    }
    spark.stop()
  }
}
