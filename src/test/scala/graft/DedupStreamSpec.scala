package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Incremental LSH near-dup detection: candidates appear as documents
  * arrive, across batches, and bucket state evicts once the watermark
  * passes the retention horizon — the properties that make the stream
  * runnable forever. */
class DedupStreamSpec extends SparkSpec {

  private val base = "alpha beta gamma delta epsilon zeta eta theta iota " +
    "kappa lambda mu nu xi omicron pi rho sigma tau upsilon phi chi psi " +
    "omega one two three four five six seven eight nine ten eleven twelve"

  private def t(s: String) = Timestamp.valueOf(s)

  test("near-identical docs collide across batches; distinct docs do not") {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.classic.SQLContext =
      org.apache.spark.sql.classic.ClassicConversions.castToImpl(spark)
        .sqlContext
    val input = MemoryStream[(Long, Timestamp, String)]
    val pairs = graft.streaming.DedupStream.candidatePairs(
      input.toDF().toDF("doc_id", "ts", "text"))
    val name = s"graft_dstream_${System.nanoTime()}"
    val q = pairs.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName(name).start()

    // batch 1: A and B near-identical; C unrelated
    input.addData(
      (1L, t("2024-01-01 10:00:00"), base),
      (2L, t("2024-01-01 10:00:10"), base + " thirteen"),
      (3L, t("2024-01-01 10:00:20"),
        "completely different words nothing shared here at all " +
          "zero overlap with any other document in this stream corpus " +
          "every token unique quince radish sprout turnip walnut yam"))
    q.processAllAvailable()
    // batch 2: D, a mutation of A, arrives later — must pair with the
    // STORED state from batch 1, not just within-batch
    input.addData((4L, t("2024-01-01 10:05:00"), base + " fourteen"))
    q.processAllAvailable()
    q.stop()

    val got = spark.table(name).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.contains((1L, 2L)), s"in-batch pair missing: $got")
    assert(got.contains((1L, 4L)) && got.contains((2L, 4L)),
      s"cross-batch pair missing: $got")
    assert(!got.exists(p => p._1 == 3L || p._2 == 3L),
      s"unrelated doc paired: $got")
  }

  test("bucket state evicts after the retention horizon") {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.classic.SQLContext =
      org.apache.spark.sql.classic.ClassicConversions.castToImpl(spark)
        .sqlContext
    val input = MemoryStream[(Long, Timestamp, String)]
    val pairs = graft.streaming.DedupStream.candidatePairs(
      input.toDF().toDF("doc_id", "ts", "text"),
      watermarkDelay = "1 minute", retentionMs = 60000L)
    val name = s"graft_dstream_evict_${System.nanoTime()}"
    val q = pairs.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName(name).start()

    input.addData((1L, t("2024-01-01 10:00:00"), base))
    q.processAllAvailable()
    // advance the watermark far past retention: 1's bucket state times out
    input.addData((9L, t("2024-01-01 12:00:00"),
      "unrelated filler advancing the watermark beyond every horizon " +
        "carrot daikon endive fennel garlic horseradish iceberg"))
    q.processAllAvailable()
    q.processAllAvailable() // extra trigger so the timeout fires
    // doc 2, identical to 1, arrives after eviction → no pair emitted
    input.addData((2L, t("2024-01-01 12:00:30"), base))
    q.processAllAvailable()
    q.stop()

    val got = spark.table(name).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!got.contains((1L, 2L)),
      s"evicted doc still matchable: $got")
  }
}
