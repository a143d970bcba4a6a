package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Decade-tier disk accounting for q42 (MinHash+LSH): runs candidate
  * GENERATION and VERIFICATION as separate phases with the Spark event
  * log on, printing wall time and the disk high-water mark after each —
  * the measurement behind the staging/ENOSPC diagnosis. Parse the
  * files under /tmp/evlog afterwards for per-stage shuffle-write bytes.
  * Usage: runMain graft.tools.Q42Probe <sfDir> */
object Q42Probe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("benchdata/sf100")
    new java.io.File("/tmp/evlog").mkdirs()
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "121"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.files.maxPartitionBytes", "32m")
      .config("spark.io.compression.codec", "zstd")
      .config("spark.eventLog.enabled", "true")
      .config("spark.eventLog.dir", "/tmp/evlog")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def freeG: Long = new java.io.File("/").getFreeSpace >> 30
    def mark(label: String, t0: Long): Unit =
      println(f"[q42probe] $label%-22s ${(System.nanoTime() - t0) / 1e9}%.1f s" +
        f"  free ${freeG}G")
    println(s"[q42probe] start free ${freeG}G")
    val sh = graft.operators.DedupOps.sharedShingles(spark, d)
    var t0 = System.nanoTime()
    sh.write.mode("overwrite").format("noop").save()
    mark("shingle_stage", t0)
    t0 = System.nanoTime()
    val candPath = graft.operators.DedupOps.stageCandidates(spark, d, sh)
    mark("generation", t0)
    t0 = System.nanoTime()
    val cand = spark.read.parquet(candPath)
    println(s"[q42probe] candidates: ${cand.count()} rows")
    val candDocs = cand.select(col("id_a").as("doc_id"))
      .union(cand.select(col("id_b").as("doc_id"))).distinct()
    println(s"[q42probe] candidate docs: ${candDocs.count()} of " +
      s"${sh.select("doc_id").distinct().count()}")
    mark("cand_stats", t0)
    t0 = System.nanoTime()
    val shCand = sh.join(candDocs, Seq("doc_id"), "left_semi")
      .select("doc_id", "s")
    val sz = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val inter = shCand.toDF("id_a", "s")
      .join(shCand.toDF("id_b", "s"), Seq("s"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("inter"))
      .join(cand, Seq("id_a", "id_b"))
    val jac = col("inter") * lit(1.0) / (col("na") + col("nb") - col("inter"))
    inter
      .join(sz.toDF("id_a", "na"), "id_a")
      .join(sz.toDF("id_b", "nb"), "id_b")
      .filter(jac >= 0.5)
      .select(col("id_a"), col("id_b"), round(jac, 3).as("jaccard"))
      .write.mode("overwrite").format("noop").save()
    mark("verification", t0)
    spark.stop()
  }
}
