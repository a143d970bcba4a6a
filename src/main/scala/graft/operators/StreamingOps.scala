package graft.operators

import graft.streaming.EventsStream

/** Structured Streaming exposed through the driver contract: the streamed
  * hourly aggregation is hash-checked against the SAME DuckDB oracle as
  * its batch twin (q30) — the exactly-once file source + complete-mode
  * window aggregation must converge to the batch answer. */
object StreamingOps {

  val streamHourly: NamedQuery = NamedQuery("q67_stream_hourly",
    Some("""SELECT event_type, date_trunc('hour', ts) AS h, count(*) AS n,
           |round(sum(value), 2) AS sum_v
           |FROM events GROUP BY 1, 2""".stripMargin),
    (s, d) => EventsStream.hourlyCounts(s, d,
      queryName = s"graft_stream_q67_${System.nanoTime()}")
      .select("event_type", "h", "n", "sum_v"))

  /** Streaming at-least-once dedup (state keyed by event_id under the
    * watermark) — hash-checked against DuckDB computing the same
    * DISTINCT-then-aggregate in batch. */
  val streamDedup: NamedQuery = NamedQuery("q109_stream_dedup",
    Some("""SELECT event_type, count(*) AS n_unique,
           |round(sum(value), 2) AS sum_v
           |FROM (SELECT DISTINCT ON (event_id) event_type, value
           |      FROM events ORDER BY event_id)
           |GROUP BY event_type""".stripMargin),
    (s, d) => EventsStream.dedupCounts(s, d,
      queryName = s"graft_stream_q109_${System.nanoTime()}")
      .select("event_type", "n_unique", "sum_v"))

  def defs: Seq[NamedQuery] = Seq(streamHourly, streamDedup)
}
