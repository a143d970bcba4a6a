package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.functions.ShingleArray
import graft.streaming.ContaminationStream

/** Stream-static join correctness: the streaming contamination gate over
  * a memory stream of eval docs must produce exactly the batch q129
  * verdicts for the same documents against the same static gram index. */
class ContaminationStreamSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("stream-static contamination matches the batch audit") {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.classic.SQLContext =
      org.apache.spark.sql.classic.ClassicConversions.castToImpl(spark)
        .sqlContext
    val docs = Tables.t(spark, dir, "documents")
    val evalSrc = Seq("src0", "src1")
    val trainGrams = docs.filter(!col("source").isInCollection(evalSrc))
      .select(explode(ShingleArray.shingleArray(col("text"), 5)).as("g"))
      .distinct()
    // the eval feed (collect is test-harness plumbing, not operator code)
    val feed = docs.filter(col("source").isInCollection(evalSrc))
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), Timestamp.valueOf("2024-01-01 10:00:00"),
        r.getString(1))).toSeq
    assert(feed.nonEmpty)

    val input = MemoryStream[(Long, Timestamp, String)]
    val out = ContaminationStream.contamination(
      input.toDF().toDF("doc_id", "ts", "text"), trainGrams)
    val name = s"graft_contam_${System.nanoTime()}"
    val q = out.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName(name).start()
    input.addData(feed: _*)
    q.processAllAvailable()
    // sentinel far past the window + watermark closes the hour-10 window
    input.addData((-1L, Timestamp.valueOf("2024-01-01 13:00:00"),
      "w1 w2 w3 w4 w5"))
    q.processAllAvailable()
    q.stop()

    val got = spark.table(name).filter(col("doc_id") >= 0)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getBoolean(3)))).toMap

    val want = SparkEntry.queries("q129_contamination")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getBoolean(3)))).toMap

    assert(got == want,
      s"stream/batch divergence: only-stream=${got.keySet -- want.keySet} " +
        s"only-batch=${want.keySet -- got.keySet} " +
        s"diff=${want.collect { case (k, v) if got.get(k).exists(_ != v) =>
          k -> (got(k), v) }}")
  }
}
