package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.LayoutMaintenance
import graft.streaming.LayoutStream

/** Contract of continuous layout maintenance: after each drain the
  * layout is content-equivalent to a full rewrite over everything fed
  * so far (the fold ≡ rewrite law, now driven by file arrival), the
  * ledger makes replays no-ops and survives compaction, and the
  * crash-window ambiguity is detected, never silently double-counted. */
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
    assert(prop(LayoutStream.InflightProp).isEmpty,
      "inflight marker must clear after a committed fold")
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

  test("ledger protocol: replays skip without folding, a failed fold " +
      "clears inflight for retry, a dead fold's window raises") {
    val t = s"ls_ledger_${System.nanoTime()}"
    spark.range(3).write.saveAsTable(t)
    assert(LayoutStream.foldGuarded(spark, t, 1L)(5L) == 5L)
    // replay at/below the high-water: skipped, the fold body never runs
    assert(LayoutStream.foldGuarded(spark, t, 1L)(
      fail("replayed fold must not run")) == 0L)
    assert(LayoutStream.foldGuarded(spark, t, 0L)(
      fail("stale fold must not run")) == 0L)
    // a FAILED fold (job aborted, files rolled back) clears the
    // marker so the stream's retry of the same batch proceeds
    val boom = intercept[RuntimeException](
      LayoutStream.foldGuarded(spark, t, 2L)(
        throw new RuntimeException("boom")))
    assert(boom.getMessage == "boom")
    assert(LayoutStream.foldGuarded(spark, t, 2L)(7L) == 7L)
    // a process KILL inside the fold-to-stamp window leaves the
    // marker set: ambiguous appends, so the next drain fails loudly
    spark.sql(s"ALTER TABLE $t SET TBLPROPERTIES " +
      s"('${LayoutStream.InflightProp}'='9')")
    val dead = intercept[IllegalStateException](
      LayoutStream.foldGuarded(spark, t, 10L)(
        fail("ambiguous-window fold must not run")))
    assert(dead.getMessage.contains("unfinished streaming fold"))
    spark.sql(s"DROP TABLE IF EXISTS $t")
  }
}
