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

  def defs: Seq[NamedQuery] = Seq(streamHourly)
}
