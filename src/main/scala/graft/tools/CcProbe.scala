package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B for the connected-components loop inside q123/q95/q134: the
  * loop's shuffles carry a few hundred edges at sf0.1 yet run at the
  * session's 32-partition width under AQE's per-stage barriers — is
  * the loop scheduling-floor-bound, and do NoAqe / narrow shuffle
  * width help? */
object CcProbe {
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
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[cc] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    DedupOps.warmShingles(spark, sfDir)
    // materialize the pair edges once so every variant times ONLY the
    // CC loop
    val pairs = DedupOps.ngramJaccard.fn(spark, sfDir)
      .filter(col("jaccard") >= 0.9).select("id_a", "id_b").cache()
    println(s"[cc] edges=${pairs.count()}")
    def withConf[A](conf: Map[String, String])(body: => A): A =
      graft.operators.NamedQuery.withConf(spark, conf)(body)
    (1 to 3).foreach { rep =>
      time(s"[$rep] A: as shipped (AQE, 32 parts)") {
        DedupOps.connectedComponents(pairs)
          .write.mode("overwrite").format("noop").save()
      }
      time(s"[$rep] B: NoAqe") {
        withConf(Map("spark.sql.adaptive.enabled" -> "false")) {
          DedupOps.connectedComponents(pairs)
            .write.mode("overwrite").format("noop").save()
        }
      }
      time(s"[$rep] C: NoAqe + 4 shuffle parts") {
        withConf(Map("spark.sql.adaptive.enabled" -> "false",
          "spark.sql.shuffle.partitions" -> "4")) {
          DedupOps.connectedComponents(pairs)
            .write.mode("overwrite").format("noop").save()
        }
      }
      time(s"[$rep] D: AQE + 4 shuffle parts") {
        withConf(Map("spark.sql.shuffle.partitions" -> "4")) {
          DedupOps.connectedComponents(pairs)
            .write.mode("overwrite").format("noop").save()
        }
      }
    }
    spark.stop()
  }
}
