package graft

import org.apache.spark.sql.functions._

import graft.streaming.EventsStream

/** Structured Streaming parity: the streaming hourly aggregation must
  * agree with its batch formulation (q30_events_hourly). */
class StreamingSpec extends SparkSpec {

  test("streamed hourly counts equal the batch result") {
    val streamed = EventsStream.hourlyCounts(spark, sf)
      .select(col("h"), col("event_type"), col("n"), col("sum_v"))
    val batch = SparkEntry.queries("q30_events_hourly")(spark, sf)
      .select(col("h"), col("event_type"), col("n"), col("sum_v"))
    assert(streamed.count() == batch.count())
    assert(streamed.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(streamed).count() == 0)
  }

  test("streamed median sketch is bit-identical to the batch sketch") {
    // the sketch buffer is a count histogram — merge order cannot change
    // it, so streaming micro-batches must reproduce the batch result
    // EXACTLY, not approximately
    val streamed = EventsStream.medianSketch(spark, sf)
      .select(col("event_type"), col("n"), col("med"))
    val batch = Tables.t(spark, sf, "events")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        graft.functions.LogHistogramQuantile
          .logHistQuantile(col("value"), Seq(0.5)).as("med"))
      .select(col("event_type"), col("n"), col("med"))
    assert(streamed.count() == batch.count())
    assert(streamed.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(streamed).count() == 0)
  }
}
