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
}
