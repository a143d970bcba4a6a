package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Per-LSH-bucket streaming state: member doc ids + newest event time. */
private[streaming] case class LshBucket(ids: Seq[Long], newestMs: Long)

/** Incremental near-duplicate detection over a document STREAM — the
  * ingestion-time counterpart of the batch MinHash-LSH pass (q42): every
  * arriving document is checked against the recent corpus and candidate
  * near-dup pairs are emitted as they appear, without ever rescanning
  * history.
  *
  * Shape: per-document MinHash signature computed as a narrow expression
  * (no shuffle — the signature is a scalar function of the shingle-hash
  * array), then one shuffle keying each signature band to its LSH bucket,
  * then `flatMapGroupsWithState` holding per-bucket membership. Documents
  * colliding with a stored member emit a candidate pair immediately.
  *
  * State is bounded two ways, which is what makes this runnable forever
  * at 100 TB/day:
  *  - event-time timeout: a bucket's membership evicts once the watermark
  *    passes its newest member by `retention` (dedup-against-recent-
  *    history semantics — the same contract dropDuplicatesWithinWatermark
  *    gives exact dedup);
  *  - per-bucket cap: a pathological hot bucket (the streaming analog of
  *    a hot shingle) stops absorbing members at `maxBucket` instead of
  *    growing without bound — candidates degrade gracefully, state never
  *    explodes.
  */
object DedupStream {

  /** Candidate pairs (id_a < id_b) from LSH-bucket collisions, emitted
    * incrementally. A pair colliding in several bands is emitted once
    * per band (at-least-once candidate semantics — verification
    * downstream is idempotent, exactly like the batch pass's
    * candidate-then-verify split).
    *
    * @param docs streaming Dataset of (doc_id, ts, text) — event-time ts
    * @param retentionMs how long (ms) a document stays matchable after
    *                    the watermark passes it
    */
  def candidatePairs(docs: DataFrame, watermarkDelay: String = "10 minutes",
      retentionMs: Long = 3600000L, numHashes: Int = 32, bands: Int = 8,
      maxBucket: Int = 64): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val rowsPerBand = numHashes / bands
    // per-doc signature as a pure expression tree: slot i is the min of
    // seed-i hashes over the shingle array (seed folded in as the first
    // hashed column). No per-doc aggregation state, no extra shuffle.
    val shingles = graft.functions.ShingleHashArray
      .shingleHashArray(col("text"), 3)
    val sig = transform(sequence(lit(0), lit(numHashes - 1)),
      i => array_min(transform(shingles, s => xxhash64(i, s))))
    val banded = docs
      .withWatermark("ts", watermarkDelay)
      .select(col("doc_id"), col("ts"), sig.as("sig"))
      .select(col("doc_id"), col("ts"),
        explode(sequence(lit(0), lit(bands - 1))).as("band"),
        col("sig"))
      .select(col("doc_id"), col("ts"), col("band"),
        xxhash64(col("band"),
          slice(col("sig"), col("band") * rowsPerBand + 1, lit(rowsPerBand)))
          .as("bh"))
      .as[(Long, java.sql.Timestamp, Int, Long)]

    banded.groupByKey { case (_, _, band, bh) => (band, bh) }
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout) {
        (_: (Int, Long), rows: Iterator[(Long, java.sql.Timestamp, Int, Long)],
            state: GroupState[LshBucket]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val incoming = rows.toArray.sortBy(r => (r._2.getTime, r._1))
            val prior = state.getOption.getOrElse(LshBucket(Seq.empty, 0L))
            var ids = prior.ids
            var newest = prior.newestMs
            val out = Seq.newBuilder[(Long, Long)]
            incoming.foreach { case (id, ts, _, _) =>
              if (!ids.contains(id)) {
                ids.foreach { other =>
                  if (other != id)
                    out += ((math.min(id, other), math.max(id, other)))
                }
                if (ids.size < maxBucket) ids = ids :+ id
                if (ts.getTime > newest) newest = ts.getTime
              }
            }
            state.update(LshBucket(ids, newest))
            // evict once the watermark passes the newest member by the
            // retention horizon (clamped above the current watermark —
            // a fully-late bucket evicts on the next trigger)
            state.setTimeoutTimestamp(
              math.max(newest + retentionMs, state.getCurrentWatermarkMs + 1))
            out.result().iterator
          }
      }.toDF("id_a", "id_b")
  }

  /** Convenience: run the stream over a Dataset already shaped as
    * (doc_id, ts, text) and drain it to a deduped static result —
    * candidate pairs distinct across bands. Pairs sink to FILES and
    * the cross-band distinct runs DISTRIBUTED over the read-back frame;
    * a memory sink would materialize the whole candidate stream on the
    * driver before deduplicating it. */
  def drainedPairs(docs: DataFrame, queryName: String): Dataset[(Long, Long)] = {
    val spark = docs.sparkSession
    import spark.implicits._
    // configurable shared-storage base (+ stale-dir reset) — see
    // StreamSinks: executors write this path on a real cluster
    val base = StreamSinks.freshBase(spark, queryName)
    val pairs = candidatePairs(docs)
    // per-(band, hash) bucket state is corpus-shaped — off-heap RocksDB,
    // same rationale as the q109 event-id dedup state
    val q = StreamSinks.withRocksDbState(spark) {
      pairs.writeStream
        .outputMode(OutputMode.Append)
        .format("parquet").option("path", s"$base/out")
        .option("checkpointLocation", s"$base/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
    }
    q.awaitTermination()
    // explicit schema: a zero-pair stream leaves no data files to infer
    // from, and the read must still return a typed empty frame
    spark.read.schema(pairs.schema).parquet(s"$base/out")
      .distinct().as[(Long, Long)]
  }
}
