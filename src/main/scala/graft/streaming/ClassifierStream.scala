package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.operators.{CurationOps, NbModel}

/** Online classification of a document STREAM under a FROZEN NB model —
  * the train-offline / serve-online half of the q181 classifier: the
  * model is learned batch-side (one corpus aggregation,
  * `CurationOps.nbModelFrames` / `Engine.trainClassifier`), collected
  * to its metadata-sized form, and applied to arriving documents as a
  * STATELESS narrow expression (`CurationOps.nbScore` — the same
  * expression batch scoring uses, so stream ≡ batch is structural, not
  * approximate).
  *
  * Scale shape: no state store, no watermark, no shuffle — scoring
  * pipelines inside the stream's file-source scan at any rate; the
  * model is a broadcast-sized literal inside codegen. A model refresh
  * is a new stream (frozen-model semantics, like the BPE tokenizer:
  * day-2 docs score under the day-1 model unless retrained
  * explicitly — monitoring thresholds stay comparable). */
object ClassifierStream {

  /** Per-document verdicts over a streaming frame: all input columns
    * plus (pred_cls, score_q). Works identically on a batch frame —
    * that identity is the spec's law. */
  def scored(docs: DataFrame, m: NbModel,
      textCol: String = "text"): DataFrame =
    CurationOps.nbScore(docs, m, textCol)

  /** Drain a bounded stream of verdicts to a static frame (append
    * mode — scoring is stateless, every row emits exactly once). */
  def drained(docs: DataFrame, m: NbModel, queryName: String,
      textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    val q = scored(docs, m, textCol).writeStream
      .outputMode(OutputMode.Append)
      .format("memory").queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(queryName)
  }
}
