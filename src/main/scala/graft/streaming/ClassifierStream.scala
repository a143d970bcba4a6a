package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
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
  * Scale shape: no state store, no watermark, no shuffle in the scoring
  * path — scoring pipelines inside the stream's file-source scan at any
  * rate; the model is a broadcast-sized literal inside codegen. NOTHING
  * corpus-sized ever reaches the driver: the monitoring aggregate
  * ([[verdictCounts]]) reduces in-stream to C bounded rows before its
  * sink, and the full per-document verdict drain ([[drained]]) sinks to
  * FILES and is read back as a distributed frame. A model refresh is a
  * new stream (frozen-model semantics, like the BPE tokenizer: day-2
  * docs score under the day-1 model unless retrained explicitly —
  * monitoring thresholds stay comparable). */
object ClassifierStream {

  /** Per-document verdicts over a streaming frame: all input columns
    * plus (pred_cls, score_q). Works identically on a batch frame —
    * that identity is the spec's law. */
  def scored(docs: DataFrame, m: NbModel,
      textCol: String = "text"): DataFrame =
    CurationOps.nbScore(docs, m, textCol)

  /** Per-class verdict monitor, aggregated IN-STREAM (complete-mode
    * groupBy — the `EventsStream.hourlyCounts` shape): the memory sink
    * holds exactly one row per predicted class, never the corpus, so
    * the q183 monitoring query stays scan-bound at any input size.
    * `labelCol` supplies the ground-truth column for the hit counter. */
  def verdictCounts(docs: DataFrame, m: NbModel, queryName: String,
      labelCol: String = "lang", textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    val agg = scored(docs, m, textCol)
      .groupBy(col("pred_cls"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("pred_cls") === col(labelCol), 1L).otherwise(0L))
          .as("n_hit"),
        min("score_q").as("min_q"), max("score_q").as("max_q"))
    val q = agg.writeStream
      .outputMode(OutputMode.Complete)
      .format("memory").queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(queryName)
  }

  /** Drain a bounded stream of per-document verdicts to a static frame
    * (append mode — scoring is stateless, every row emits exactly
    * once). Verdicts sink to FILES and come back as a distributed
    * parquet frame: a memory sink here would collect the whole scored
    * corpus — text included — onto the driver heap, the exact
    * anti-pattern this engine exists to avoid. */
  def drained(docs: DataFrame, m: NbModel, queryName: String,
      textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    // configurable shared-storage base (+ stale-dir reset) — see
    // StreamSinks: executors write this path on a real cluster
    val base = StreamSinks.freshBase(spark, queryName)
    val verdicts = scored(docs, m, textCol)
    val q = verdicts.writeStream
      .outputMode(OutputMode.Append)
      .format("parquet").option("path", s"$base/out")
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // explicit schema: a zero-row stream leaves no data files to infer
    // from, and the read must still return a typed empty frame
    spark.read.schema(verdicts.schema).parquet(s"$base/out")
  }
}
