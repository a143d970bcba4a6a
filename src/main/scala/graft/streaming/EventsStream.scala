package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Structured Streaming over the events table: the streaming analog of
  * q30_events_hourly. The reference has no streaming surface (SURVEY.md
  * §2.2 last row) — this is part of the beyond-reference layer.
  *
  * Watermark + tumbling-window aggregation: state is bounded (windows
  * older than watermark are evicted), so the same query runs indefinitely
  * against a 100 TB/day firehose. Locally the parquet directory is drained
  * with Trigger.AvailableNow into a memory sink.
  */
object EventsStream {

  /** Streaming exactly-once dedup: drop duplicate event_ids as they
    * arrive (the at-least-once-delivery dedup every ingestion pipeline
    * needs), then aggregate per type. Converges to the batch DISTINCT
    * answer. Uses dropDuplicatesWithinWatermark so the per-id state is
    * actually EVICTED once the watermark passes an event's time — plain
    * dropDuplicates(id) never evicts keys that lack the event-time
    * column, growing without bound on a real stream. The contract is
    * the one retries satisfy: a duplicate delivered within the
    * watermark delay of the original is dropped. */
  def dedupCounts(spark: SparkSession, dir: String,
      queryName: String = "graft_events_dedup"): DataFrame = {
    val stream = graft.Tables.eventsStream(spark, dir)
      .withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark("event_id")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_unique"),
        round(sum("value"), 2).as("sum_v"))
    // per-event_id state is INPUT-sized (every live id inside the
    // watermark) — run it on RocksDB so the state lives off-heap
    // (measured: the on-heap default OOMs an 8 GB heap at sf10)
    val q = StreamSinks.withRocksDbState(spark) {
      stream.writeStream
        .outputMode("complete")
        .format("memory")
        .queryName(queryName)
        .trigger(Trigger.AvailableNow())
        .start()
    }
    q.awaitTermination()
    spark.table(queryName)
  }

  /** Streaming quantile monitor: per event_type, the log-histogram
    * median sketch ([[graft.functions.LogHistogramQuantile]]) over the
    * value stream — the bounded-memory latency/size-percentile monitor
    * every ingestion pipeline runs. The sketch buffer is a histogram of
    * counts, so its merge is ORDER-INDEPENDENT: the streamed result is
    * bit-identical to the batch sketch over the same data
    * (StreamingSpec asserts exact equality), and state per group is the
    * fixed histogram — the query runs forever at any rate. */
  def medianSketch(spark: SparkSession, dir: String,
      queryName: String = "graft_events_sketch"): DataFrame = {
    val stream = graft.Tables.eventsStream(spark, dir)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        graft.functions.LogHistogramQuantile
          .logHistQuantile(col("value"), Seq(0.5)).as("med"))
    val q = stream.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(queryName)
  }

  /** Streaming approximate-distinct monitor: per event_type, HLL++
    * distinct user_id over the stream — the bounded-memory cardinality
    * monitor (unique visitors / unique documents per source) an
    * ingestion pipeline runs continuously. HLL union is bucket-wise
    * register max: commutative, associative, idempotent — so the
    * streamed sketch is BIT-IDENTICAL to the batch sketch over the
    * same data regardless of micro-batch boundaries (StreamingSpec
    * asserts exact equality, plus the error bound against the exact
    * count), and per-group state is the fixed register array. */
  def distinctUsers(spark: SparkSession, dir: String,
      queryName: String = "graft_events_distinct"): DataFrame = {
    val stream = graft.Tables.eventsStream(spark, dir)
      .groupBy(col("event_type"))
      .agg(approx_count_distinct(col("user_id"), 0.02).as("approx_users"),
        count(lit(1)).as("n"))
    val q = stream.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(queryName)
  }

  /** Hourly per-type counts computed as a stream; blocks until the source
    * is drained and returns the materialized result. */
  def hourlyCounts(spark: SparkSession, dir: String,
      queryName: String = "graft_events_stream"): DataFrame = {
    // file streaming sources need a directory: stream the sf dir with a
    // filename glob selecting the events table (schema-adaptive — see
    // Tables.eventsStream)
    val stream = graft.Tables.eventsStream(spark, dir)
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_v"))
      .select(col("window.start").as("h"), col("event_type"),
        col("n"), col("sum_v"))
    val q = stream.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(queryName)
  }
}
