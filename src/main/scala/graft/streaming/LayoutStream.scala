package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.operators.LayoutMaintenance

/** Continuous maintenance of the bucketed layouts from a live feed —
  * the streaming face of [[graft.operators.LayoutMaintenance]]: each
  * micro-batch of newly-arrived event files folds into the layout as
  * one O(delta) CDC-shaped delta (an append-only file feed IS an
  * insert-lineage change feed), so the layout a metrics pipeline
  * queries is never more than one trigger behind ingest and the corpus
  * is never re-scanned. This closes the loop the batch fold verbs
  * leave open: they fold a delta you already have; this module turns
  * arrival itself into deltas.
  *
  * Exactly-once, with the fold's own fail-loudly contract: the fold
  * verbs APPEND (signed partials / bucketed rows), so a replayed
  * micro-batch must not re-fold. Spark's foreachBatch replays a batch
  * after restart under the SAME batchId, so the layout carries a
  * ledger in its table properties — `lastBatch` (high-water of folded
  * batch ids; a replay at or below it is skipped) and `inflight` (set
  * before the fold, cleared after the high-water stamp commits).
  * A batch that FAILS rolls its staged files back (FileFormatWriter
  * aborts the job), so the handler clears `inflight` and the stream's
  * retry of the same batchId proceeds cleanly. A process KILL inside
  * the fold-to-stamp window is the one case plain parquet cannot make
  * atomic — the next drain finds `inflight` set and RAISES, directing
  * the operator to rebuild the layout (rewrite or compact*), because
  * it cannot know whether the dead fold's appends committed:
  * detected-and-rebuilt, never silently double-counted. (On a
  * transactional table format the stamp and the append become one
  * commit and the window disappears; the ledger protocol is the plain
  * parquet spelling of that txn-version check.) Compaction preserves
  * the ledger: `republish` carries `graft.`-prefixed properties across
  * the swap.
  *
  * At 100 TB/day the same queries run with a real trigger instead of
  * AvailableNow; per micro-batch the cost is one pass over the NEW
  * files (one shuffle, touched-buckets-only file writes), and the
  * per-layout lock serializes folds against a concurrent OPTIMIZE the
  * same way the batch path does.
  */
object LayoutStream {

  private[graft] val LastBatchProp = "graft.layout.stream.lastBatch"
  private[graft] val InflightProp = "graft.layout.stream.inflight"

  /** Continuously maintain the minute-rollup layout `layout`
    * ([[graft.operators.BucketedOps.eventsMinuteRollup]] shape) from
    * the parquet event feed under `dir`; blocks until the feed is
    * drained (AvailableNow). The first batch creates the layout. */
  def maintainMinuteRollup(spark: SparkSession, dir: String,
      layout: String, checkpointDir: String,
      glob: String = "*.parquet"): Unit =
    run(spark, dir, checkpointDir, glob) { (batch, id) =>
      // ledger + refresh on the OUTER session: the micro-batch handler
      // runs under a session CLONE, and a fold's append invalidates
      // only the writing session's cached file listing — the session
      // the user queries would keep serving the pre-fold file set
      foldGuarded(spark, layout, id)(
        LayoutMaintenance.foldMinuteDelta(asInsertFeed(batch, id), layout))
    }

  /** Continuously maintain the user-bucketed event-log layout `layout`
    * ([[graft.operators.BucketedOps.eventsByUser]] shape) from the
    * parquet event feed under `dir`. Append-only by construction —
    * a file feed has no deletes — so the per-row fold's INSERT-lineage
    * requirement always holds. */
  def maintainEventLog(spark: SparkSession, dir: String,
      layout: String, checkpointDir: String,
      glob: String = "*.parquet"): Unit =
    run(spark, dir, checkpointDir, glob) { (batch, id) =>
      foldGuarded(spark, layout, id)(
        LayoutMaintenance.foldEventsDelta(asInsertFeed(batch, id), layout))
    }

  /** An arrived micro-batch viewed as the insert-lineage CDC delta the
    * batch fold verbs take: new files are inserts, the batch id is the
    * commit version. */
  private def asInsertFeed(batch: Dataset[Row], id: Long): DataFrame =
    batch.withColumn("_change_type", lit("insert"))
      .withColumn("_commit_version", lit(id))

  /** Run `fold` for micro-batch `batchId` under the layout's ledger
    * protocol (skip replays, stamp the high-water, detect a dead
    * fold's window). Returns rows appended, 0 for a skipped replay.
    * Package-visible so the spec can drive the protocol directly. */
  private[graft] def foldGuarded(s: SparkSession, layout: String,
      batchId: Long)(fold: => Long): Long =
    LayoutMaintenance.withLayoutLock(layout) {
      val exists = s.catalog.tableExists(layout)
      val props: Map[String, String] =
        if (!exists) Map.empty
        else s.sql(s"SHOW TBLPROPERTIES $layout").collect()
          .map(r => r.getString(0) -> r.getString(1)).toMap
      props.get(InflightProp).foreach { dead =>
        throw new IllegalStateException(
          s"Constraint Error: layout $layout has an unfinished " +
            s"streaming fold (batch $dead) — a crash inside the " +
            "fold-to-stamp window leaves appends of unknown state " +
            "that a replay would double-count; rebuild the layout " +
            "(BucketedOps rewrite or LayoutMaintenance.compact*) " +
            s"and clear $InflightProp")
      }
      if (props.get(LastBatchProp).exists(_.toLong >= batchId)) 0L
      else {
        // the first fold CREATES the table, so batch 0 has no ledger
        // row to stamp beforehand; its crash case is covered by the
        // table-create commit instead (an uncommitted create leaves
        // no table, so the replay starts clean)
        if (exists) s.sql(s"ALTER TABLE $layout SET TBLPROPERTIES " +
          s"('$InflightProp'='$batchId')")
        val n =
          try fold
          catch { case e: Throwable =>
            // a FAILED job aborted its staged files; clear the marker
            // so the stream's retry of this same batchId can proceed
            if (exists)
              try s.sql(
                s"ALTER TABLE $layout UNSET TBLPROPERTIES IF EXISTS " +
                  s"('$InflightProp')")
              catch { case _: Throwable => () }
            throw e
          }
        s.sql(s"ALTER TABLE $layout SET TBLPROPERTIES " +
          s"('$LastBatchProp'='$batchId')")
        s.sql(s"ALTER TABLE $layout UNSET TBLPROPERTIES IF EXISTS " +
          s"('$InflightProp')")
        // the fold's append invalidated the WRITING session's cached
        // file listing; invalidate this (the querying) session's too,
        // or it keeps planning over the pre-fold file set
        s.catalog.refreshTable(layout)
        n
      }
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
