package graft.streaming

import org.apache.spark.sql.{Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.operators.{BucketedOps, LayoutMaintenance}

/** Continuous maintenance of the bucketed layouts from a live feed —
  * the streaming face of [[graft.operators.LayoutMaintenance]]: each
  * micro-batch of newly-arrived event files folds into the layout as
  * one O(delta) delta (an append-only file feed IS an insert-lineage
  * change feed), so the layout a metrics pipeline queries is never more
  * than one trigger behind ingest and the corpus is never re-scanned.
  * This closes the loop the batch fold verbs leave open: they fold a
  * delta you already have; this module turns arrival itself into
  * deltas.
  *
  * Exactly-once, ATOMICALLY: Spark's foreachBatch replays a batch after
  * restart under the SAME batchId, and the fold commits through
  * [[LayoutMaintenance.commitStreamFold]] — staged bucketed write,
  * batch-tagged rename-into-place, then the `lastBatch` high-water
  * stamp. Because every committed file carries its batch id in its
  * name, a replay of a dead fold is deterministically recoverable (drop
  * the batch's tagged files, refold) no matter where the kill landed —
  * mid-stage, mid-rename, or pre-stamp. The r11 protocol's one
  * unfixable case on plain parquet (a kill between append-commit and
  * stamp left appends of UNKNOWN state, forcing a detect-and-rebuild
  * `inflight` marker) no longer exists: the fold is idempotent under
  * replay, never rebuilt, never double-counted. Compaction preserves
  * the ledger: `republish`/`swapPublish` carry `graft.`-prefixed
  * properties across the swap.
  *
  * At 100 TB/day the same queries run with a real trigger instead of
  * AvailableNow; per micro-batch the cost is one pass over the NEW
  * files (one shuffle, ≤ bucket-count file renames), and the per-layout
  * lock serializes folds against a concurrent OPTIMIZE the same way the
  * batch path does.
  */
object LayoutStream {

  private[graft] val LastBatchProp = "graft.layout.stream.lastBatch"

  /** Continuously maintain the minute-rollup layout `layout`
    * ([[graft.operators.BucketedOps.eventsMinuteRollup]] shape) from
    * the parquet event feed under `dir`; blocks until the feed is
    * drained (AvailableNow). The first batch creates the layout. */
  def maintainMinuteRollup(spark: SparkSession, dir: String,
      layout: String, checkpointDir: String,
      glob: String = "*.parquet"): Unit =
    run(spark, dir, checkpointDir, glob) { (batch, id) =>
      // commit on the OUTER session: the micro-batch handler runs
      // under a session CLONE, and the fold's file moves invalidate
      // only the writing session's cached file listing — the session
      // the user queries would keep serving the pre-fold file set
      LayoutMaintenance.commitStreamFold(spark, layout, id,
        LayoutMaintenance.minutePartials(batch)
          .select("event_type", "m", "n", "sv"),
        Seq("event_type"), BucketedOps.RollupBuckets,
        Seq("event_type", "m"), LastBatchProp)
      ()
    }

  /** Continuously maintain the user-bucketed event-log layout `layout`
    * ([[graft.operators.BucketedOps.eventsByUser]] shape) from the
    * parquet event feed under `dir`. Append-only by construction — a
    * file feed has no deletes — so the arrived rows ARE the insert
    * delta. */
  def maintainEventLog(spark: SparkSession, dir: String,
      layout: String, checkpointDir: String,
      glob: String = "*.parquet"): Unit =
    run(spark, dir, checkpointDir, glob) { (batch, id) =>
      LayoutMaintenance.commitStreamFold(spark, layout, id, batch,
        Seq("user_id"), BucketedOps.BucketCount,
        Seq("user_id", "ts"), LastBatchProp)
      ()
    }

  private def run(spark: SparkSession, dir: String, checkpointDir: String,
      glob: String)(handle: (Dataset[Row], Long) => Unit): Unit = {
    val q = graft.Tables.eventsStream(spark, dir, glob, recursive = true)
      .writeStream
      .foreachBatch { (b: Dataset[Row], id: Long) => handle(b, id) }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
