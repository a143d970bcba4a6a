package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** q41 lever A/B: the pair-stream aggregation groups 431 M (id_a, id_b)
  * rows into 395 M distinct pairs (avg 1.09 occurrences) — the partial
  * aggregate reduces ~nothing and its per-partition hash maps carry ~4 M
  * entries each. A/B the status-quo fused partial against exchanging the
  * raw 16-byte pair rows first (q12's adopted law).
  * Usage: runMain graft.tools.Q41Probe2 <sfDir> */
object Q41Probe2 {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("benchdata/sf10")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPEATS", "3").toInt
    val tierBytes = {
      val s = java.nio.file.Files.walk(java.nio.file.Paths.get(d))
      try s.filter(java.nio.file.Files.isRegularFile(_))
        .mapToLong(java.nio.file.Files.size(_)).sum()
      finally s.close()
    }
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions",
        math.max(32L, tierBytes / (128L << 20) + 1).toString)
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
    def run(name: String, mk: () => DataFrame): Unit = {
      mk().write.mode("overwrite").format("noop").save()
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        mk().write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"[q41b] $name%-24s med ${ts(ts.size / 2)}%7.2f " +
        f"min ${ts.head}%7.2f max ${ts.last}%7.2f")
    }
    val sh = graft.operators.DedupOps.sharedShingles(spark, d)
    sh.write.mode("overwrite").format("noop").save()
    val a = sh.toDF("id_a", "s"); val b = sh.toDF("id_b", "s")
    def pairsA = a.join(b, Seq("s")).filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("inter"))
    def pairsB = a.join(b, Seq("s")).filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .repartition(col("id_a"), col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("inter"))
    run("pairs_A_statusquo", () => pairsA)
    run("pairs_B_repart", () => pairsB)
    spark.stop()
  }
}
