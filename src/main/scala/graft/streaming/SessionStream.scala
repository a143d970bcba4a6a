package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

/** Custom stateful streaming: per-user sessionization with a 30-minute
  * inactivity gap via `flatMapGroupsWithState` — the
  * KeyValueGroupedDataset custom-state path (no built-in operator has
  * these semantics; state is one small record per live user, evicted by
  * event-time timeout, so the operator is stable against an unbounded
  * stream).
  *
  * Batch twin: q57_events_sessions computes the same session count with
  * a lag window; SessionStreamSpec asserts they agree.
  */
object SessionStream {

  case class Event(user_id: Long, ts_us: Long)
  case class SessionState(count: Long, lastTs: Long)
  case class UserSessions(user_id: Long, n_sessions: Long)

  private val gapUs: Long = 1800L * 1000000L

  /** Drains the events table as a stream; emits final per-user session
    * counts. For the bounded local source we emit at drain-end; against
    * a live stream the same function emits on state timeout. */
  def sessionCounts(spark: SparkSession, dir: String,
      queryName: String): DataFrame = {
    import spark.implicits._
    // schema-adaptive shared reader (Tables.eventsStream) — `ts` is a µs
    // TimestampType whatever the feed's physical encoding was
    val events = graft.Tables.eventsStream(spark, dir)
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"))
      .as[Event]

    def update(userId: Long, events: Iterator[Event],
        state: GroupState[SessionState]): Iterator[UserSessions] = {
      // events within a micro-batch are not ordered — sort the batch;
      // state carries (session count so far, last event time) across
      // batches. One state record per user: O(live users) memory.
      val sorted = events.map(_.ts_us).toArray.sorted
      var st = state.getOption.getOrElse(SessionState(0L, Long.MinValue))
      sorted.foreach { t =>
        if (st.lastTs == Long.MinValue || t - st.lastTs > gapUs)
          st = SessionState(st.count + 1, t)
        else st = st.copy(lastTs = t)
      }
      state.update(st)
      Iterator(UserSessions(userId, st.count))
    }

    val sessions = events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Update, GroupStateTimeout.NoTimeout)(update)

    // per-user state is entity-sized (every live user) — off-heap
    // RocksDB keeps the heap flat at any user cardinality
    val q = StreamSinks.withRocksDbState(spark) {
      sessions.toDF().writeStream
        .outputMode("update")
        .format("memory")
        .queryName(queryName)
        .trigger(Trigger.AvailableNow())
        .start()
    }
    q.awaitTermination()
    // update-mode memory sink may hold one row per user per batch — keep
    // the final state per user
    spark.table(queryName)
      .groupBy("user_id").agg(max("n_sessions").as("n_sessions"))
  }
}
