package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.ShingleArray

/** Streaming train/eval contamination gate — the STREAM-STATIC join
  * pattern: a live feed of candidate documents (a crawl, a user-upload
  * queue) is checked against the static training-gram index before
  * anything enters an eval set (the continuous version of the batch
  * q129 audit).
  *
  * Shape: per incoming doc, explode its distinct 5-gram strings (exact
  * strings, same reasoning as q129 — a hashed key would make the verdict
  * collision-dependent), left-join the static gram index (Spark plans a
  * stream-static join: the static side is re-scannable per micro-batch,
  * broadcast when small, shuffled otherwise — no state grows from it),
  * then a watermarked per-(window, doc) count aggregation emits each
  * doc's verdict once its event-time window closes. State is bounded by
  * the watermark: closed windows are evicted, so the query runs forever
  * at feed rate.
  *
  * At 100 TB the static index is a bucketed parquet table of distinct
  * grams; the per-batch join shuffles only the incoming batch's grams —
  * the stream side is always the small side.
  */
object ContaminationStream {

  /** docs: streaming (doc_id LONG, ts TIMESTAMP, text STRING);
    * trainGrams: static (g STRING, distinct). Emits one row per closed
    * doc: (doc_id, n_grams, n_hit, contaminated ≥ 0.5 ratio). */
  def contamination(docs: DataFrame, trainGrams: DataFrame,
      watermarkDelay: String = "10 minutes",
      window_ : String = "1 hour"): DataFrame = {
    val grams = docs.withWatermark("ts", watermarkDelay)
      .select(col("doc_id"), col("ts"),
        explode(ShingleArray.shingleArray(col("text"), 5)).as("g"))
    // de-dup the static side INSIDE the operator: a duplicate gram in
    // trainGrams would multiply matched rows through the left join and
    // inflate both n_grams and n_hit — distinctness is enforced here,
    // not trusted to the caller (re-planned per micro-batch, cheap)
    val marked = grams.join(
      trainGrams.select(col("g")).distinct().withColumn("hit", lit(1)),
      Seq("g"), "left_outer")
    marked
      .groupBy(window(col("ts"), window_), col("doc_id"))
      .agg(count(lit(1)).as("n_grams"), count(col("hit")).as("n_hit"))
      .select(col("doc_id"), col("n_grams"), col("n_hit"),
        (col("n_hit") * 1.0 / col("n_grams") >= 0.5).as("contaminated"))
  }
}
