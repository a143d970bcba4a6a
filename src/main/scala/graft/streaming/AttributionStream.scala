package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked stream-stream interval join — the attribution shape: a
  * `purchase` event joins the same user's most recent `click` within a
  * bounded lookback. Both sides carry watermarks and the join condition
  * bounds event time on both ends, so each side's buffered state is
  * evicted once the other side's watermark passes the interval — state
  * stays O(events inside the lookback window), which is what lets the
  * same query run forever against a firehose.
  */
object AttributionStream {

  /** Join purchases to clicks by user within `lookback`. Inputs are
    * streaming DataFrames with columns (user_id, event_type, ts, value).
    * Output: one row per (click, purchase) pair inside the window. */
  def attribute(clicks: DataFrame, purchases: DataFrame,
      lookback: String = "30 minutes",
      watermark: String = "1 hour"): DataFrame = {
    val c = clicks.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"))
      .withWatermark("click_ts", watermark)
    val p = purchases.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"),
        col("value").as("amount"))
      .withWatermark("purchase_ts", watermark)
    p.join(c,
      col("p_user") === col("c_user") &&
        col("click_ts") <= col("purchase_ts") &&
        col("click_ts") >= col("purchase_ts") - expr(s"INTERVAL $lookback"),
      "inner")
      .select(col("p_user").as("user_id"), col("click_ts"),
        col("purchase_ts"), col("amount"))
  }
}
