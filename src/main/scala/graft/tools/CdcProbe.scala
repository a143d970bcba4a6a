package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Engine
import graft.Tables.t

/** Scale probe for the change-data feed (Engine.tableChanges): times the
  * three resolution paths on a managed orders table at the given tier —
  *
  *  1. append step (INSERT lineage): must cost O(delta), independent of
  *     the corpus;
  *  2. row-rewriting step, full-row diff (exceptAll both ways): exact
  *     but corpus-scale — the documented cost of CDC without identity;
  *  3. row-rewriting step, identity-column path: one full-outer
  *     equi-join on the key emitting only changed rows.
  *
  * Usage: SPARK_GRAFT_SF_DIR=benchdata/sf10 runMain graft.tools.CdcProbe
  */
object CdcProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "benchdata/sf10")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.files.maxPartitionBytes", "32m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = Engine(spark)

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    def noop(df: org.apache.spark.sql.DataFrame): Long = {
      df.write.mode("overwrite").format("noop").save(); df.count()
    }

    val orders = t(spark, sfDir, "orders")
    val nRows = orders.count()
    e.createTableAs("cdc_orders", orders)
    val v0 = e.currentVersion("cdc_orders")

    // 1. append 0.1% with fresh keys → O(delta) lineage path
    val delta = orders.sample(0.001, 42)
      .withColumn("o_orderkey", -col("o_orderkey"))
    e.insertInto("cdc_orders", delta)
    val (n1, t1) = time(noop(e.tableChanges("cdc_orders", v0)))
    println(f"[cdcprobe] corpus=$nRows%d rows, tier=$sfDir")
    println(f"[cdcprobe] append_feed      $t1%7.2f s  ($n1 change rows)")

    // 2./3. UPDATE-shaped MERGE touching 0.1% of rows
    val src = orders.sample(0.001, 7)
      .withColumn("o_orderpriority", lit("9-CDC-PROBE"))
    e.mergeInto("cdc_orders", src, Seq("o_orderkey"))
    val v2 = e.currentVersion("cdc_orders")
    val (n2, t2) = time(noop(e.tableChanges("cdc_orders", v2 - 1, v2)))
    println(f"[cdcprobe] fullrow_diff     $t2%7.2f s  ($n2 change rows)")
    val (n3, t3) = time(noop(
      e.tableChanges("cdc_orders", v2 - 1, v2, Seq("o_orderkey"))))
    println(f"[cdcprobe] idcolumn_diff    $t3%7.2f s  ($n3 change rows)")
    e.dropTable("cdc_orders")
    spark.stop()
  }
}
