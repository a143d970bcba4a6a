package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** q173 scale diagnosis: window counts vs DISTINCT-gram counts per
  * tier. If distinct grams grow ~linearly with the corpus (synthetic
  * per-copy mutations — a Heaps-law violation, same artifact as
  * q138's vocabulary), the hash aggregation's keyspace is what grows,
  * not the plan's shuffle volume per row. Usage:
  *   runMain graft.tools.Q173Probe <tierDir> [<tierDir>...]
  */
object Q173Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "256")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.foreach { dir =>
      val docs = graft.Tables.t(spark, dir, "documents").select("text")
      val toks = docs.select(explode(graft.functions.ShingleHashArray
        .positionalShingleHashArray(col("text"), 8)).as("h"))
      val row = toks.agg(count(lit(1)).as("windows"),
        approx_count_distinct(col("h"), 0.01).as("grams")).head()
      println(s"[q173probe] $dir windows=${row.getLong(0)} " +
        s"distinct_grams=${row.getLong(1)}")
      // stage attribution: the dup-gram aggregation alone vs the full
      // query — the delta is the mark/merge side (second shingling
      // pass + semi-join shuffle + per-doc window)
      def time(tag: String)(f: => Unit): Unit = (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        f
        println(s"[q173probe] $dir $tag rep$i " +
          f"${(System.nanoTime() - t0) / 1e9}%.1f s")
      }
      time("dup_agg_only") {
        toks.groupBy("h").agg(count(lit(1)).as("cnt"))
          .filter(col("cnt") > 1)
          .agg(count(lit(1))).head()
      }
      time("full_q173") {
        graft.SparkEntry.queries("q173_substring_spans")(spark, dir)
          .write.mode("overwrite").format("noop").save()
      }
    }
    spark.stop()
  }
}
