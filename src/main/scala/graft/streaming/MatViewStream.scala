package graft.streaming

import org.apache.spark.sql.{Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Continuous materialized-aggregate maintenance — the streaming
  * counterpart of [[graft.Engine.createMaterializedAggregate]] /
  * `refreshMaterializedAggregate`: keep the MV's distributive partials
  * (per measure: sum/min/max/cnt, plus n_rows, the exact artifact
  * schema the batch verbs produce) up to date against an append feed,
  * so the covered-dashboard query never waits for a refresh cadence.
  *
  * Spark-native shape: a streaming groupBy-aggregate in COMPLETE output
  * mode. The state store holds one row of running partials per dims
  * group — dims-cardinality state, BOUNDED regardless of feed volume
  * (the same reason the batch artifact is readable at 100 TB: partials
  * are dims-sized, not data-sized). Each micro-batch emits the full
  * refreshed partial table (a handful of rows) and the sink swaps the
  * artifact atomically (write-to-temp, delete, rename), so a reader
  * always sees one consistent MV snapshot — never a half-written one.
  * The swap is idempotent per batch content, and source offsets commit
  * through the checkpoint, so a crash/re-run converges to the same
  * artifact (MatViewStreamSpec re-drains against the same checkpoint
  * and asserts no change): at-least-once replay + idempotent swap =
  * exactly-once maintenance.
  *
  * At 100 TB/day the same query runs with a real trigger instead of
  * AvailableNow; per micro-batch the cost is one map-side partial
  * aggregation of the NEW files plus a |dims|-row state merge — the
  * corpus is never rescanned, which is the streaming version of the
  * incremental-refresh guarantee. On an object store the local-FS
  * rename becomes a manifest-pointer swap.
  */
object MatViewStream {

  /** Maintain event_type-grouped partials of `value` over the parquet
    * feed at `dir`, swapping the artifact at `artifactPath` once per
    * micro-batch; blocks until the feed is drained (AvailableNow).
    * Re-running with the same checkpoint and no new files is a no-op. */
  def maintainPartials(spark: SparkSession, dir: String,
      artifactPath: String, checkpointDir: String,
      glob: String = "*.parquet"): Unit = {
    // schema-adaptive shared reader (Tables.eventsStream)
    val stream = graft.Tables.eventsStream(spark, dir, glob,
      recursive = true)
    val partials = stream.groupBy(col("event_type"))
      .agg(
        sum(col("value")).as("sum_value"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"),
        count(col("value")).as("cnt_value"),
        count(lit(1)).as("n_rows"))
    val q = partials.writeStream
      .outputMode("complete")
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        val tmp = artifactPath + "_swap_tmp"
        batch.write.mode("overwrite").parquet(tmp)
        val fs = org.apache.hadoop.fs.FileSystem.getLocal(
          batch.sparkSession.sparkContext.hadoopConfiguration)
        fs.delete(new org.apache.hadoop.fs.Path(artifactPath), true)
        fs.rename(new org.apache.hadoop.fs.Path(tmp),
          new org.apache.hadoop.fs.Path(artifactPath))
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
