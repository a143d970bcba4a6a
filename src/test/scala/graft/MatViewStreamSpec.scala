package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.streaming.MatViewStream

/** Contract of continuous MV maintenance: after each drain the artifact
  * equals the batch partial-aggregation of everything fed so far
  * (incremental across feed growth), and a re-drain over the same
  * checkpoint changes nothing (exactly-once). */
class MatViewStreamSpec extends SparkSpec {

  private def batchPartials(df: DataFrame): DataFrame =
    df.groupBy(col("event_type")).agg(
      sum(col("value")).as("sum_value"),
      min(col("value")).as("min_value"),
      max(col("value")).as("max_value"),
      count(col("value")).as("cnt_value"),
      count(lit(1)).as("n_rows"))

  /** min/max/cnt/n_rows exact; sum within float-reassociation ulp. */
  private def assertSamePartials(artifact: DataFrame, expected: DataFrame,
      clue: String): Unit = {
    def keyed(df: DataFrame) = df.collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getLong(4), r.getLong(5))).toMap
    val (a, e) = (keyed(artifact), keyed(expected))
    assert(a.keySet == e.keySet, s"$clue: group sets differ")
    a.foreach { case (k, (s1, mn1, mx1, c1, n1)) =>
      val (s2, mn2, mx2, c2, n2) = e(k)
      assert(math.abs(s1 - s2) <= 1e-9 * math.max(1.0, math.abs(s2)),
        s"$clue: sum_value differs for $k: $s1 vs $s2")
      assert(mn1 == mn2 && mx1 == mx2 && c1 == c2 && n1 == n2,
        s"$clue: exact partials differ for $k")
    }
  }

  test("streaming MV maintenance tracks the growing feed and is " +
      "exactly-once across re-drains") {
    val feed = Files.createTempDirectory("graft_mvstream_feed").toString
    val art = s"${Files.createTempDirectory("graft_mvstream").toString}/mv"
    val ckpt = Files.createTempDirectory("graft_mvstream_ckpt").toString
    // raw feed schema (ts stays nanos-as-long, same as the source file)
    val raw = spark.read.parquet(s"$sf/events.parquet")
    val chunk1 = raw.filter(col("event_id") % 2 === 0)
    val chunk2 = raw.filter(col("event_id") % 2 === 1)
    chunk1.write.parquet(s"$feed/chunk1")
    MatViewStream.maintainPartials(spark, feed, art, ckpt)
    assertSamePartials(spark.read.parquet(art), batchPartials(chunk1),
      "after first drain")
    // the feed grows; the next drain merges ONLY the new files into the
    // running state — the artifact must now equal partials of the union
    chunk2.write.parquet(s"$feed/chunk2")
    MatViewStream.maintainPartials(spark, feed, art, ckpt)
    assertSamePartials(spark.read.parquet(art), batchPartials(raw),
      "after incremental drain")
    // no new data: offsets are committed, so a re-drain swaps nothing
    val filesBefore = new java.io.File(art).listFiles.map(_.getName).toSet
    MatViewStream.maintainPartials(spark, feed, art, ckpt)
    assert(new java.io.File(art).listFiles.map(_.getName).toSet
      == filesBefore, "empty re-drain rewrote the artifact")
    assertSamePartials(spark.read.parquet(art), batchPartials(raw),
      "after empty re-drain")
    // the artifact serves a covered dashboard: re-aggregating partials
    // equals the direct aggregate over the full feed
    val served = spark.read.parquet(art)
      .agg(sum(col("sum_value")).as("s"), sum(col("n_rows")).as("n"))
      .collect().head
    val direct = raw.agg(sum(col("value")), count(lit(1))).collect().head
    assert(math.abs(served.getDouble(0) - direct.getDouble(0)) <=
      1e-9 * math.abs(direct.getDouble(0)))
    assert(served.getLong(1) == direct.getLong(1))
  }
}
