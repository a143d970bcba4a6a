package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.streaming.ExportStream

/** Exactly-once contract of the streaming parquet export: one drain
  * equals the batch answer; a re-run over the same checkpoint commits
  * nothing new. */
class ExportStreamSpec extends SparkSpec {

  test("checkpointed export is exactly-once across re-runs") {
    val out = Files.createTempDirectory("graft_export_out").toString
    val ckpt = Files.createTempDirectory("graft_export_ckpt").toString
    ExportStream.exportPartitioned(spark, sf, out, ckpt)
    val batch = Tables.t(spark, sf, "events").count()
    // the file sink must be read through its manifest (_spark_metadata),
    // which spark.read.parquet on the sink dir does automatically
    val once = spark.read.parquet(out)
    assert(once.count() == batch, "first drain lost or duplicated events")
    // partitioned layout: event_type is a directory column
    assert(new java.io.File(out).listFiles
      .exists(_.getName.startsWith("event_type=")))
    // re-run with the same checkpoint: offsets are committed, so the
    // sink must be byte-for-byte unchanged — exactly-once, not
    // at-least-once
    ExportStream.exportPartitioned(spark, sf, out, ckpt)
    val again = spark.read.parquet(out)
    assert(again.count() == batch, "re-run duplicated committed events")
    // and the content matches the batch table exactly
    val b = Tables.t(spark, sf, "events")
      .select(col("event_id"), col("user_id"), col("value"))
    val s = again.select(col("event_id"), col("user_id"), col("value"))
    assert(s.exceptAll(b).count() == 0 && b.exceptAll(s).count() == 0)
  }
}
