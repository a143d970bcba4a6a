package graft

import org.apache.spark.sql.functions._

import graft.streaming.SessionStream

/** Custom-state streaming vs the batch lag-window formulation. */
class SessionStreamSpec extends SparkSpec {

  test("stateful streamed session counts equal the batch window result") {
    val streamed = SessionStream.sessionCounts(spark, sf,
      s"graft_sessions_${System.nanoTime()}")
    val batch = SparkEntry.queries("q57_events_sessions")(spark, sf)
    assert(streamed.count() == batch.count())
    val joined = streamed.toDF("user_id", "s_n")
      .join(batch.toDF("user_id", "b_n"), "user_id")
    assert(joined.filter(col("s_n") =!= col("b_n")).count() == 0)
  }
}
