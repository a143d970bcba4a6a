package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * The `events` table carries a nanosecond-precision timestamp, which the
  * vectorized parquet reader rejects by default; we read it as raw nanos
  * (`spark.sql.legacy.parquet.nanosAsLong`) and convert to a microsecond
  * `TimestampType` column with integer arithmetic (`DIV`, not `/`, because
  * nanos-since-epoch exceeds the 2^53 exact-double range).
  *
  * Scale note: these are plain `spark.read.parquet` scans — at 100 TB the
  * same call distributes across executors with row-group-aligned splits
  * (ref: /root/reference/src/server/driver/task_partitioner.cpp:59-96 does
  * this by hand; Spark's FileSourceScanExec does it natively).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  def t(spark: SparkSession, dir: String, name: String): DataFrame = name match {
    case "events" =>
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      // keep the raw nanos as `ts_ns` (the §1.2 TIMESTAMP_NS side-channel:
      // full ns precision survives as LONG even though TimestampType is µs);
      // bench tiers store µs timestamps directly — derive ts_ns from those
      val raw = spark.read.parquet(s"$dir/events.parquet")
      if (raw.schema("ts").dataType ==
          org.apache.spark.sql.types.LongType)
        raw.withColumnRenamed("ts", "ts_ns")
          .withColumn("ts", expr("timestamp_micros(ts_ns DIV 1000)"))
      else raw.withColumn("ts_ns", expr("unix_micros(ts) * 1000"))
    case other =>
      spark.read.parquet(s"$dir/$other.parquet")
  }

  /** Register every table as a temp view so `spark.sql` queries can use the
    * same table names as the DuckDB oracle SQL. */
  def registerViews(spark: SparkSession, dir: String): Unit =
    names.foreach(n => t(spark, dir, n).createOrReplaceTempView(n))
}
