package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.LayoutMaintenance
import graft.streaming.LayoutStream

/** Contract of continuous layout maintenance: after each drain the
  * layout is content-equivalent to a full rewrite over everything fed
  * so far (the fold ≡ rewrite law, now driven by file arrival), the
  * ledger makes replays no-ops and survives compaction, and the fold
  * commit is ATOMIC under replay — a kill at any point of the commit
  * window (post-stage, mid-rename, pre-stamp) replays to exactly the
  * committed-once content, never a rebuild, never a double-count. */
class LayoutStreamSpec extends SparkSpec {

  private def normFeed(paths: String*): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    Tables.normalizeEvents(spark.read.parquet(paths: _*))
  }

  private def rollupOf(ev: DataFrame): Map[(String, Any), (Long, Double)] =
    ev.groupBy(col("event_type"), date_trunc("minute", col("ts")).as("m"))
      .agg(count(lit(1)).as("n"), sum("value").as("sv"))
      .collect()
      .map(r => (r.getString(0), r.get(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap

  private def assertSameRollup(layout: String, expected: DataFrame,
      clue: String): Unit = {
    val got = LayoutMaintenance.canonicalRollup(spark, layout).collect()
      .map(r => (r.getString(0), r.get(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    val exp = rollupOf(expected)
    assert(got.keySet == exp.keySet, s"$clue: minute-group sets differ")
    got.foreach { case (k, (n, sv)) =>
      val (en, esv) = exp(k)
      assert(n == en, s"$clue: count differs for $k: $n vs $en")
      assert(math.abs(sv - esv) <= 1e-9 * math.max(1.0, math.abs(esv)),
        s"$clue: sum differs for $k: $sv vs $esv")
    }
  }

  test("streaming minute-rollup maintenance tracks the growing feed, " +
      "replays are no-ops, and the ledger survives compaction") {
    val feed = Files.createTempDirectory("graft_lstream_feed").toString
    val ckpt = Files.createTempDirectory("graft_lstream_ckpt").toString
    val layout = s"ls_roll_${System.nanoTime()}"
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$sf/events.parquet")
    raw.filter(col("event_id") % 2 === 0).write.parquet(s"$feed/chunk1")
    LayoutStream.maintainMinuteRollup(spark, feed, layout, ckpt)
    assertSameRollup(layout, normFeed(s"$feed/chunk1"), "after first drain")
    // the feed grows; only the new files fold (O(delta)), and the
    // result equals a full rewrite over the union
    raw.filter(col("event_id") % 2 === 1).write.parquet(s"$feed/chunk2")
    LayoutStream.maintainMinuteRollup(spark, feed, layout, ckpt)
    val all = normFeed(s"$feed/chunk1", s"$feed/chunk2")
    assertSameRollup(layout, all, "after incremental drain")
    def prop(k: String): Option[String] =
      spark.sql(s"SHOW TBLPROPERTIES $layout").collect()
        .collectFirst { case r if r.getString(0) == k => r.getString(1) }
    val hw = prop(LayoutStream.LastBatchProp)
    assert(hw.nonEmpty, "high-water ledger stamp missing after drains")
    // no new files: a re-drain folds nothing and moves no ledger
    LayoutStream.maintainMinuteRollup(spark, feed, layout, ckpt)
    assertSameRollup(layout, all, "after empty re-drain")
    assert(prop(LayoutStream.LastBatchProp) == hw)
    // OPTIMIZE mid-stream: canonical content, ledger carried across
    // the swap — a post-compaction replay must still be skippable
    LayoutMaintenance.compactMinuteRollup(spark, layout)
    assertSameRollup(layout, all, "after compaction")
    assert(prop(LayoutStream.LastBatchProp) == hw,
      "compaction dropped the exactly-once ledger")
    spark.sql(s"DROP TABLE IF EXISTS $layout")
  }

  test("streaming event-log maintenance: layout content equals the " +
      "fed rows after each drain") {
    val feed = Files.createTempDirectory("graft_lstream_ev_feed").toString
    val ckpt = Files.createTempDirectory("graft_lstream_ev_ckpt").toString
    val layout = s"ls_evlog_${System.nanoTime()}"
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$sf/events.parquet")
    raw.filter(col("event_id") % 2 === 0).write.parquet(s"$feed/chunk1")
    LayoutStream.maintainEventLog(spark, feed, layout, ckpt)
    def rows(df: DataFrame): Set[Seq[Any]] = {
      val cs = df.columns.sorted.toSeq
      df.select(cs.map(col): _*).collect().map(_.toSeq).toSet
    }
    assert(rows(spark.table(layout)) == rows(normFeed(s"$feed/chunk1")))
    raw.filter(col("event_id") % 2 === 1).write.parquet(s"$feed/chunk2")
    LayoutStream.maintainEventLog(spark, feed, layout, ckpt)
    assert(rows(spark.table(layout)) ==
      rows(normFeed(s"$feed/chunk1", s"$feed/chunk2")))
    spark.sql(s"DROP TABLE IF EXISTS $layout")
  }

  test("atomic fold commit: replays skip without folding, and a kill " +
      "at ANY point of the commit window replays to exactly-once " +
      "content — no rebuild, no double-count") {
    import graft.operators.BucketedOps
    val layout = s"ls_atomic_${System.nanoTime()}"
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = Tables.normalizeEvents(spark.read.parquet(s"$sf/events.parquet"))
    val b0 = raw.filter(col("event_id") % 2 === 0)
    val b1 = raw.filter(col("event_id") % 2 === 1)
    def partials(df: DataFrame): DataFrame =
      LayoutMaintenance.minutePartials(df).select("event_type", "m", "n", "sv")
    def commit(id: Long, df: DataFrame): Long =
      LayoutMaintenance.commitStreamFold(spark, layout, id, partials(df),
        Seq("event_type"), BucketedOps.RollupBuckets,
        Seq("event_type", "m"), LayoutStream.LastBatchProp)
    // batch 0 creates + commits
    assert(commit(0L, b0) > 0L)
    assertSameRollup(layout, b0, "after batch 0")
    // replay at/below the high-water: skipped, nothing refolds
    assert(commit(0L, b0) == 0L)
    assertSameRollup(layout, b0, "after batch-0 replay")
    // crash injection: kill the commit of batch 1 after k renames —
    // k=0 (staged but nothing moved), k=1 (mid-rename: a TORN set of
    // tagged files is on disk), k=MaxValue (all renames done, stamp
    // never written: the exact window the r11 protocol could only
    // detect). Each replay must land on exactly-once content.
    for (k <- Seq(0, 1, Int.MaxValue)) {
      LayoutMaintenance.crashAfterRenames = k
      val dead = intercept[RuntimeException](commit(1L, b1))
      assert(dead.getMessage.contains("injected crash"), s"k=$k")
      LayoutMaintenance.crashAfterRenames = -1
      // the dead fold left batch-1 work in unknown partial state;
      // the replay recovers deterministically and commits once
      assert(commit(1L, b1) > 0L, s"k=$k replay")
      assertSameRollup(layout, b0.union(b1), s"after k=$k crash+replay")
      // roll the ledger back so the next k replays the same batch
      // (content must also roll back: drop the batch's tagged files,
      // exactly what a replay's recovery step does)
      if (k != Int.MaxValue) {
        val dir = new org.apache.hadoop.fs.Path(
          spark.sessionState.catalog.getTableMetadata(
            org.apache.spark.sql.catalyst.TableIdentifier(layout)).location)
        val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
        fs.listStatus(dir).filter(_.getPath.getName.startsWith("gb1-"))
          .foreach(f => fs.delete(f.getPath, false))
        spark.sql(s"ALTER TABLE $layout SET TBLPROPERTIES " +
          s"('${LayoutStream.LastBatchProp}'='0')")
        spark.catalog.refreshTable(layout)
        assertSameRollup(layout, b0, s"after k=$k rollback")
      }
    }
    // post-crash-matrix: replay of the committed batch is a no-op
    assert(commit(1L, b1) == 0L)
    assertSameRollup(layout, b0.union(b1), "final")
    spark.sql(s"DROP TABLE IF EXISTS $layout")
    spark.sql(s"DROP TABLE IF EXISTS ${layout}_stage")
  }
}
