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

  /** Streaming classification under a batch-trained FROZEN NB model
    * (train offline / serve online): the model is q181's, learned from
    * the same corpus; the stream scores every arriving document
    * STATELESSLY, the per-class verdict aggregate reduces IN-STREAM
    * (complete-mode groupBy — its memory sink holds one row per class,
    * never the corpus), and the result is hash-checked against DuckDB
    * recomputing the whole train+score+argmax pipeline in batch —
    * streaming ≡ batch, proven by the oracle, not assumed. */
  val streamClassify: NamedQuery = NamedQuery("q183_stream_classify",
    CurationOps.nbClassifier.oracle.map(q181 =>
      s"""WITH verdicts AS ($q181)
         |SELECT pred_lang AS pred_cls, count(*) AS n,
         |  CAST(sum(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
         |  min(score_q) AS min_q, max(score_q) AS max_q
         |FROM verdicts GROUP BY 1""".stripMargin),
    (s, d) => {
      val docs = graft.Tables.t(s, d, "documents")
      val (model, prior, release) = CurationOps.nbModelFrames(docs, "lang",
        CurationOps.NbVocabCap)
      val m = NbModel.collect(model, prior)
      release()
      graft.streaming.ClassifierStream.verdictCounts(
        graft.Tables.docsStream(s, d), m,
        queryName = s"graft_stream_q183_${System.nanoTime()}")
    })

  def defs: Seq[NamedQuery] = Seq(streamHourly, streamDedup, streamClassify)
}
