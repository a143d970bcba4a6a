package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage accounting for q123 (the largest bench row): splits the
  * composed pipeline into (pairs ≥ 0.9, connected components, kept
  * filter + packShards) and times each prefix with the shared shingle
  * stage pre-warmed, mirroring the bench's setup. */
object Q123Probe {
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
    import graft.operators.{CurationOps, DedupOps}
    import graft.Tables.t
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[q123] $label%-36s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    (1 to 3).foreach { rep =>
      DedupOps.warmShingles(spark, sfDir)
      val pairs = time(s"[$rep] pairs >=0.9 (ngramJaccard)") {
        val p = DedupOps.ngramJaccard.fn(spark, sfDir)
          .filter(col("jaccard") >= 0.9).select("id_a", "id_b")
        p.write.mode("overwrite").format("noop").save(); p
      }
      val drop = time(s"[$rep] connectedComponents") {
        val d = DedupOps.connectedComponents(pairs).select("doc_id")
        d.write.mode("overwrite").format("noop").save(); d
      }
      time(s"[$rep] kept+packShards") {
        import org.apache.spark.sql.functions._
        val spark2 = spark
        import spark2.implicits._
        val rates = Seq(("en", 10), ("de", 50), ("fr", 50), ("es", 80),
          ("zh", 100)).toDF("lang", "pct")
        val kept = t(spark, sfDir, "documents")
          .select(col("doc_id"), col("lang"),
            graft.functions.TokenCount.tokenCount(col("text")).as("tok"))
          .join(drop, Seq("doc_id"), "left_anti")
          .filter(col("tok") >= 20)
          .join(broadcast(rates), Seq("lang"))
          .filter(col("doc_id") % 97 < col("pct"))
        CurationOps.packShards(kept.select("doc_id", "lang", "tok"))
          .write.mode("overwrite").format("noop").save()
      }
      time(s"[$rep] full q123") {
        graft.SparkEntry.queries("q123_curation_pipeline")(spark, sfDir)
          .write.mode("overwrite").format("noop").save()
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
