package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch diagnosis for the event-log compaction sort-metadata law. */
object CompactProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val events = graft.Tables.t(spark, "/root/testdata/sf0.001", "events")
    val eInc = "probe_evlog"
    spark.sql(s"DROP TABLE IF EXISTS $eInc")
    spark.sql(s"DROP TABLE IF EXISTS ${eInc}_cmp")
    graft.operators.BucketedOps.writeBucketed(
      events.filter(col("event_id") % 4 =!= 0), eInc, Seq("user_id"),
      sortCols = Seq("user_id", "ts"))
    def files(tag: String): Unit = {
      val fs = new java.io.File(s"spark-warehouse/$eInc").listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.getName).sorted
      println(s"[probe] $tag files=${fs.length}")
      fs.take(40).foreach(f => println(s"[probe]   $f"))
    }
    files("fresh")
    def planOf(): Unit = graft.operators.NamedQuery.withConf(spark, Map(
      "spark.sql.legacy.bucketedTableScan.outputOrdering" -> "true",
      "spark.sql.adaptive.enabled" -> "false")) {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("ts")
      val df = spark.table(eInc).withColumn("rn", row_number().over(w))
        .groupBy("user_id").agg(max("rn").as("n"))
      df.collect()
      println(org.apache.spark.sql.classic.ClassicConversions
        .castToImpl(df).queryExecution.executedPlan.toString.take(2500))
    }
    println("== fresh plan =="); planOf()
    // append a second file set
    val delta = events.filter(col("event_id") % 4 === 0)
      .withColumn("_change_type", lit("insert"))
      .withColumn("_commit_version", lit(1L))
    graft.operators.LayoutMaintenance.foldEventsDelta(delta, eInc)
    files("after fold")
    graft.operators.LayoutMaintenance.compactEventsByUser(spark, eInc)
    files("after compact")
    println("== compacted plan =="); planOf()
    spark.sql(s"DROP TABLE IF EXISTS $eInc")
    spark.stop()
  }
}
