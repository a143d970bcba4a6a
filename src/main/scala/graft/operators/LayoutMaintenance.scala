package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** O(delta) maintenance of the bucketed layouts from the engine's CDC
  * feed ([[graft.Engine#tableChanges]]). The r8–r10 layouts
  * ([[BucketedOps]]) are rewrite-per-snapshot; a production pipeline
  * maintains them from the change feed so a delta commit costs work
  * proportional to the DELTA, never a corpus re-scan. The reference has
  * no layout maintenance at all (it re-reads parquet per query —
  * task_partitioner.cpp row-group splits); this module is the piece
  * that makes the layout story hold at a 100 TB ingest cadence.
  *
  * Three maintenance algebras:
  *
  *  - the minute rollup is a PARTIAL-AGGREGATE store: count and sum
  *    compose, and they compose with SIGNS — an insert contributes
  *    (+1, +value), a delete or update_preimage (−1, −value), an
  *    update_postimage (+1, +value). A delta commit therefore folds by
  *    APPENDING its signed minute partials into the same buckets;
  *    consumers re-aggregate (the ResultMerger composition law q164
  *    already applies to the time grain), so the fold reads neither the
  *    existing rollup nor the raw corpus. Appended rows per fold:
  *    O(distinct (type, minute) pairs in the delta).
  *
  *  - the token manifest and the user-bucketed event log
  *    ([[foldEventsDelta]]) are per-ROW layouts, so only the append
  *    cadence (INSERT lineage — the production corpus-ingest shape) has
  *    an O(delta) fold: new docs' manifest rows append into their
  *    (lang, b) buckets. A delta containing deletes or updates has no
  *    O(delta) fold without merge-on-read machinery; [[foldManifestDelta]]
  *    detects that with one O(delta) aggregate over the feed and raises,
  *    directing the caller to the rewrite path — fail loudly, never
  *    corrupt (the same contract as the CDC duplicate-key guard).
  *
  *  - the sort-clustered layouts ([[foldTimeSortedDelta]],
  *    [[foldZOrderDelta]]) are per-row too, but their invariant is
  *    physical ROW ORDER, not bucket assignment: a delta appends as
  *    its own range-partitioned sorted files, whose row-group min/max
  *    stats prune independently of the base generation's — so
  *    skipping survives the fold and only file count / range overlap
  *    accumulate until [[compactSortedLayout]]. The Z-order fold
  *    additionally reuses the rank grid recorded on the table, since
  *    z-values from different grids do not share a curve.
  *
  * (The fact pair ([[BucketedOps.factPair]]) shares the per-row
  * algebra, but its orders side is year-PARTITIONED as well as
  * bucketed, so its fold needs partition-aware appends; TPC-H facts
  * are immutable in every replayed scenario, so that fold is left to
  * the rewrite path deliberately rather than shipped untested.)
  *
  * Appending a second file into a bucket degrades GRACEFULLY: bucket
  * hash distribution stays sound (zero-exchange plans keep their shape
  * — bucket pruning and clustering don't care about file count), while
  * Spark stops trusting per-bucket sort metadata the moment a bucket
  * has more than one file (FileSourceScanExec reports outputOrdering
  * only for single-file buckets), so sort-dependent plans get a correct
  * in-memory sort back until [[compactMinuteRollup]] /
  * [[compactTokenManifest]] restore the one-file-per-bucket invariant —
  * the OPTIMIZE step of this lakehouse in miniature, published
  * write-tmp-then-rename like the persisted shingle index. */
object LayoutMaintenance {

  // Folds and compactions of the SAME layout are serialized JVM-wide:
  // compaction is snapshot-read → write-tmp → swap, so a fold landing
  // mid-compaction would be silently dropped by the swap (lost
  // update), violating the fail-loudly contract. Same per-name
  // monitor discipline as the Engine's per-table writer serialization;
  // monitors are reentrant, so compact* verbs can publish under their
  // own lock.
  private val layoutLocks =
    scala.collection.concurrent.TrieMap.empty[String, Object]
  private[graft] def withLayoutLock[A](name: String)(f: => A): A =
    layoutLocks.getOrElseUpdate(name, new Object).synchronized(f)

  /** Write-tmp-then-swap publish: build the replacement content at
    * `${name}_cmp` (the callback's argument), then atomically-enough
    * re-point `name` — never overwrite a table mid-read. The single
    * copy of the swap ritual every compaction path shares. Engine
    * metadata — every `graft.`-prefixed table property (the Z-grid,
    * the streaming-fold ledger) — is carried across the swap: the
    * rewritten table is the same layout, so its grid and its
    * exactly-once high-water must survive an OPTIMIZE. */
  private def swapPublish(s: SparkSession, name: String)
      (writeTmp: String => Unit): Unit = {
    val props =
      if (!s.catalog.tableExists(name)) Array.empty[(String, String)]
      else s.sql(s"SHOW TBLPROPERTIES $name").collect()
        .map(r => r.getString(0) -> r.getString(1))
        .filter(_._1.startsWith("graft."))
    val tmp = s"${name}_cmp"
    writeTmp(tmp)
    s.sql(s"DROP TABLE IF EXISTS $name")
    s.sql(s"ALTER TABLE $tmp RENAME TO $name")
    if (props.nonEmpty)
      s.sql(s"ALTER TABLE $name SET TBLPROPERTIES (" +
        props.map { case (k, v) => s"'$k'='$v'" }.mkString(",") + ")")
    // the renamed table reuses the dropped table's warehouse path:
    // drop any cached file listing so the next plan sees the
    // replacement file set, not the pre-swap one
    s.catalog.refreshTable(name)
  }

  /** Minute-grain partials of an events-shaped frame — the projection
    * both the full rewrite ([[BucketedOps.eventsMinuteRollup]]) and the
    * delta fold share, so the two paths cannot drift. */
  private[graft] def minutePartials(events: DataFrame): DataFrame =
    events
      .groupBy(col("event_type"), date_trunc("minute", col("ts")).as("m"))
      .agg(count(lit(1)).as("n"), sum("value").as("sv"))

  /** Token-manifest rows of a documents-shaped frame — shared by
    * [[BucketedOps.docsTokens]] and the delta fold. */
  private[graft] def manifestRows(docs: DataFrame): DataFrame =
    docs
      .filter(col("lang").isNotNull)
      .select(col("doc_id"), col("lang"),
        graft.functions.TokenCount.tokenCount(col("text")).as("tok"))
      .withColumn("b", floor(col("doc_id") / 8192L))
      .filter(col("b").isNotNull)

  /** Fold one CDC feed (the output of `tableChanges` on the events
    * table) into the minute-rollup layout `name` by appending signed
    * minute partials. Returns the number of partial rows appended — the
    * fold's touched-row count, O(distinct delta minutes). */
  def foldMinuteDelta(feed: DataFrame, name: String): Long =
      withLayoutLock(name) {
    val signed = feed.withColumn("_sgn",
      when(col("_change_type").isin("insert", "update_postimage"), 1L)
        .otherwise(lit(-1L)))
    val partials = signed
      .groupBy(col("event_type"), date_trunc("minute", col("ts")).as("m"))
      .agg(sum("_sgn").as("n"),
        sum(col("value") * col("_sgn")).as("sv"))
      .select("event_type", "m", "n", "sv")
      .persist()
    try {
      val touched = partials.count()
      // same murmur3 pmod assignment as the bucket ids → one file per
      // TOUCHED bucket, not tasks × buckets files
      partials.repartition(BucketedOps.RollupBuckets, col("event_type"))
        .write.mode("append").format("parquet")
        .bucketBy(BucketedOps.RollupBuckets, "event_type")
        .sortBy("event_type", "m")
        .saveAsTable(name)
      touched
    } finally { partials.unpersist(); () }
  }

  /** Fold one INSERT-lineage CDC feed of the documents table into the
    * token-manifest layout `name`. Raises on a feed with deletes or
    * updates (no O(delta) fold exists for per-row layouts without
    * merge-on-read; use [[BucketedOps.docsTokens]]' rewrite). Returns
    * manifest rows appended. */
  def foldManifestDelta(feed: DataFrame, name: String): Long =
      withLayoutLock(name) {
    val rows = manifestRows(
      insertOnlyRows(feed, "token-manifest", "BucketedOps.docsTokens"))
      .select("doc_id", "lang", "tok", "b")
      .persist()
    try {
      val touched = rows.count()
      rows.repartition(BucketedOps.BucketCount, col("lang"), col("b"))
        .write.mode("append").format("parquet")
        .bucketBy(BucketedOps.BucketCount, "lang", "b")
        .sortBy("lang", "b", "doc_id")
        .saveAsTable(name)
      touched
    } finally { rows.unpersist(); () }
  }

  /** Fold one INSERT-lineage CDC feed of the events table into the
    * user-bucketed event-log layout `name` — the ingest cadence of an
    * event store (the log is append-only; a retention purge is a
    * rewrite). Same per-row algebra as the token manifest: raises on
    * deletes/updates rather than corrupting. Appended rows land in
    * their user_id buckets sorted (user_id, ts), so bucket pruning and
    * the zero-exchange clustering survive immediately; per-bucket sort
    * METADATA returns only after [[compactEventsByUser]] (multi-file
    * buckets get a correct in-memory sort in the meantime — the
    * graceful-degradation contract above). Returns events appended. */
  def foldEventsDelta(feed: DataFrame, name: String): Long =
      withLayoutLock(name) {
    val rows = insertOnlyRows(feed, "event-log",
      "BucketedOps.eventsByUser").persist()
    try {
      val touched = rows.count()
      rows.repartition(BucketedOps.BucketCount, col("user_id"))
        .write.mode("append").format("parquet")
        .bucketBy(BucketedOps.BucketCount, "user_id")
        .sortBy("user_id", "ts")
        .saveAsTable(name)
      touched
    } finally { rows.unpersist(); () }
  }

  /** OPTIMIZE for a fold-maintained event-log layout: republish one
    * sorted file per bucket, restoring the zero-sort plans (q161/q162
    * shapes) that single-file-bucket sort metadata enables. */
  def compactEventsByUser(s: SparkSession, name: String): Unit =
    republish(s, name, s.table(name), Seq("user_id"),
      BucketedOps.BucketCount, Seq("user_id", "ts"))

  /** Canonical content of a (possibly tombstone-carrying) minute-rollup
    * table: partials re-aggregated per (event_type, m), fully-deleted
    * minutes (net count 0) dropped — exactly what a full rewrite from
    * the current snapshot would contain. */
  def canonicalRollup(s: SparkSession, name: String): DataFrame =
    s.table(name).groupBy("event_type", "m")
      .agg(sum("n").as("n"), sum("sv").as("sv"))
      .filter(col("n") =!= 0)

  /** OPTIMIZE for a fold-maintained rollup: re-aggregate accumulated
    * partials to canonical form and republish one file per bucket
    * (restoring the sort-metadata invariant), atomically via
    * write-then-rename. */
  def compactMinuteRollup(s: SparkSession, name: String): Unit =
    republish(s, name, canonicalRollup(s, name),
      Seq("event_type"), BucketedOps.RollupBuckets, Seq("event_type", "m"))

  /** OPTIMIZE for a fold-maintained token manifest: republish the same
    * rows one file per bucket, restoring the zero-sort scan plan the
    * packing queries get from single-file buckets. */
  def compactTokenManifest(s: SparkSession, name: String): Unit =
    republish(s, name, s.table(name),
      Seq("lang", "b"), BucketedOps.BucketCount, Seq("lang", "b", "doc_id"))

  private def insertOnlyRows(feed: DataFrame, what: String,
      rewrite: String): DataFrame = {
    val types = feed.groupBy("_change_type").count().collect()
    val bad = types.filterNot(_.getString(0) == "insert")
    if (bad.nonEmpty)
      throw new IllegalStateException(
        s"Constraint Error: $what incremental fold supports INSERT " +
          "deltas only; feed contains [" +
          bad.map(r => s"${r.getString(0)}×${r.getLong(1)}").mkString(", ") +
          s"] — rewrite the layout ($rewrite) or compact")
    feed.drop("_change_type", "_commit_version")
  }

  /** Columns of the sort-clustered event layouts, in layout order. */
  private val EventCols =
    Seq("event_id", "ts", "user_id", "event_type", "value")

  /** Fold one INSERT-lineage CDC feed of the events table into the
    * time-sorted layout `name` ([[BucketedOps.eventsByTime]]): the
    * delta's rows append as their own range-partitioned sorted files.
    * The new files' ts ranges may overlap the existing files' — but
    * data skipping is ROW-GROUP min/max stats, so a time-window scan
    * still prunes to the window inside BOTH generations; what
    * accumulates over many folds is file count and range overlap,
    * which [[compactSortedLayout]] (OPTIMIZE) collapses back to
    * disjoint ranges. O(delta) read and write; the corpus is never
    * re-scanned. Returns events appended. */
  def foldTimeSortedDelta(feed: DataFrame, name: String): Long =
      withLayoutLock(name) {
    val rows = insertOnlyRows(feed, "time-sorted layout",
      "BucketedOps.eventsByTime")
      .select(EventCols.map(col): _*).persist()
    try {
      val touched = rows.count()
      BucketedOps.writeSorted(rows, name, col("ts"),
        deltaFiles(touched), append = true)
      touched
    } finally { rows.unpersist(); () }
  }

  /** Fold one INSERT-lineage CDC feed of the events table into the
    * Z-ordered layout `name` ([[BucketedOps.eventsZOrder]]). The
    * delta's z-values are computed against the rank grid RECORDED ON
    * THE TABLE at layout-write time ([[BucketedOps.zBoundsOf]]) — a
    * z-value is only comparable within one grid, so the fold must
    * reuse it verbatim; rows the corpus has since outgrown (a new
    * user id past the recorded max, a timestamp past the horizon)
    * clamp to the grid edge ([[graft.functions.Morton.rank16]]):
    * locally coarser clustering, never wrong pruning, because the
    * skipping predicate reads the RAW column stats, not z. Returns
    * events appended. */
  def foldZOrderDelta(feed: DataFrame, name: String): Long =
      withLayoutLock(name) {
    val s = feed.sparkSession
    val grid = BucketedOps.zBoundsOf(s, name)
    val rows = insertOnlyRows(feed, "Z-order layout",
      "BucketedOps.eventsZOrder")
      .select(EventCols.map(col): _*)
      .withColumn("z", BucketedOps.zOf(grid)).persist()
    try {
      val touched = rows.count()
      BucketedOps.writeSorted(rows, name, col("z"),
        deltaFiles(touched), append = true)
      touched
    } finally { rows.unpersist(); () }
  }

  /** Delta file count: mirror the ~row-group-sized files of the base
    * layout rather than fragmenting a small delta across
    * [[BucketedOps.clusterFiles]] range slots. */
  private def deltaFiles(rows: Long): Int =
    math.max(1L, math.min(BucketedOps.clusterFiles.toLong,
      rows / 100000L)).toInt

  /** OPTIMIZE for a fold-maintained sort-clustered layout: republish
    * the accumulated generations as one disjoint-range file set
    * (write-tmp-then-swap; Z-grid properties ride the swap's generic
    * `graft.` carry so later folds keep their curve). */
  def compactSortedLayout(s: SparkSession, name: String,
      sortCol: String): Unit = withLayoutLock(name) {
    swapPublish(s, name) { tmp =>
      BucketedOps.writeSorted(s.table(name), tmp, col(sortCol),
        BucketedOps.clusterFiles)
    }
  }

  /** Filename tag of streaming batch `batchId`'s committed files. A
    * PREFIX, because Spark's bucket-id parse anchors at the END of the
    * file name (`BucketingUtils`: `.*_(\d+)(?:\..*)?$`) — a prefixed
    * bucket file is still a valid bucket file. */
  private[graft] def batchTag(batchId: Long): String = s"gb$batchId-"

  /** Test-only failpoint: when ≥ 0, [[commitStreamFold]] throws after
    * performing that many rename-into-place steps (before the ledger
    * stamp) — simulating a process kill at every point of the commit
    * window so the spec can prove replay recovery is exactly-once. */
  @volatile private[graft] var crashAfterRenames: Int = -1

  private def tablePath(s: SparkSession,
      name: String): org.apache.hadoop.fs.Path =
    new org.apache.hadoop.fs.Path(
      s.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier(name)).location)

  /** Atomically commit `rows` into the bucketed layout `name` as
    * streaming micro-batch `batchId` — the fold verb whose crash window
    * is CLOSED, not just detected. The r11 ledger protocol
    * (inflight-marker + detect-and-rebuild) had one unfixable case on
    * a plain append: a kill between the fold's file commit and the
    * high-water stamp left appends of unknown state. This verb removes
    * the unknown: the fold never appends through the table — it stages
    * a bucketed write at `${name}_stage` (its own job commit; a crash
    * there leaves the layout untouched), then renames each staged file
    * into the layout directory under the [[batchTag]] prefix, then
    * stamps `ledgerProp = batchId`. Every intermediate state is now
    * DETERMINISTICALLY recoverable because the tag names the batch: a
    * replay first deletes any tagged files of its own batch id (a dead
    * fold's partial or complete rename), then refolds — so a kill at
    * ANY point (mid-stage, mid-rename, pre-stamp) replays to exactly
    * the committed-once content. This is a manifest commit spelled in
    * file names: the tag is the manifest entry, the stamp is a cache.
    *
    * Scale shape: renames are per-touched-bucket (≤ `buckets`, not
    * per-row) and atomic on HDFS-semantics filesystems; an object
    * store without atomic rename would swap the tag for a real
    * manifest file — same protocol, different spelling. Returns rows
    * committed; 0 for a skipped replay. */
  def commitStreamFold(s: SparkSession, name: String, batchId: Long,
      rows: DataFrame, keys: Seq[String], buckets: Int,
      sortCols: Seq[String], ledgerProp: String): Long =
      withLayoutLock(name) {
    val exists = s.catalog.tableExists(name)
    val stamped =
      exists && s.sql(s"SHOW TBLPROPERTIES $name").collect()
        .exists(r => r.getString(0) == ledgerProp &&
          r.getString(1).toLong >= batchId)
    if (stamped) 0L
    else {
      val fsConf = s.sparkContext.hadoopConfiguration
      if (!exists)
        // empty shell first: the metastore create is its own single
        // commit (a kill right after leaves an empty layout the replay
        // fills), and it gives the renames a directory to land in
        BucketedOps.writeBucketed(rows.limit(0), name, keys, buckets,
          sortCols = sortCols)
      val dir = tablePath(s, name)
      val fs = dir.getFileSystem(fsConf)
      val tag = batchTag(batchId)
      // deterministic recovery: a dead fold of THIS batch may have
      // renamed any subset of its files in; remove them and refold
      fs.listStatus(dir).iterator
        .filter(_.getPath.getName.startsWith(tag))
        .foreach(f => fs.delete(f.getPath, false))
      val persisted = rows.persist()
      val stage = s"${name}_stage"
      try {
        val n = persisted.count()
        if (n > 0) {
          BucketedOps.writeBucketed(persisted, stage, keys, buckets,
            sortCols = sortCols)
          val stageDir = tablePath(s, stage)
          val stageFs = stageDir.getFileSystem(fsConf)
          var moved = 0
          stageFs.listStatus(stageDir).iterator
            .filter { f =>
              val fn = f.getPath.getName
              f.isFile && !fn.startsWith("_") && !fn.startsWith(".")
            }
            .foreach { f =>
              if (crashAfterRenames >= 0 && moved >= crashAfterRenames)
                throw new RuntimeException(
                  s"injected crash after $moved renames")
              val dst = new org.apache.hadoop.fs.Path(dir,
                tag + f.getPath.getName)
              if (!fs.rename(f.getPath, dst))
                throw new java.io.IOException(
                  s"rename ${f.getPath} -> $dst failed")
              moved += 1
            }
          if (crashAfterRenames >= 0)
            throw new RuntimeException(
              s"injected crash after $moved renames (pre-stamp)")
          s.sql(s"DROP TABLE IF EXISTS $stage")
        }
        s.sql(s"ALTER TABLE $name SET TBLPROPERTIES " +
          s"('$ledgerProp'='$batchId')")
        s.catalog.refreshTable(name)
        n
      } finally { persisted.unpersist(); () }
    }
  }

  private def republish(s: SparkSession, name: String, content: DataFrame,
      keys: Seq[String], buckets: Int, sortCols: Seq[String]): Unit =
    withLayoutLock(name) {
      swapPublish(s, name) { tmp =>
        // autoBucketedScan=false: when `content` is a direct scan of the
        // bucketed table, the planner elides writeBucketed's repartition
        // against the scan's bucket distribution AND auto-disables the
        // bucketed read (no operator "needs" it) — write tasks then hold
        // mixed buckets and the compaction silently leaves multi-file
        // buckets, defeating its whole purpose (caught by the event-log
        // law's plan assertion). Forcing the bucketed scan makes the
        // elision sound: scan partitions ARE the buckets.
        graft.operators.NamedQuery.withConf(s, Map(
          "spark.sql.sources.bucketing.autoBucketedScan.enabled" ->
            "false")) {
          BucketedOps.writeBucketed(content, tmp, keys, buckets,
            sortCols = sortCols)
        }
      }
    }
}
