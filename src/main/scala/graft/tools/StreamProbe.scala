package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Attribution probe for q183's decade row: separates (1) model
  * training (the q181 batch aggregation), (2) batch scoring of the
  * same corpus with the same frozen model, (3) the in-stream scoring +
  * complete-mode monitor, and (4) a stream pass WITHOUT the aggregate
  * (scan+score only, noop-equivalent file sink) — so the decade table
  * can say which stage moves. Usage: runMain graft.tools.StreamProbe
  * <sfDir> */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.head
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.files.maxPartitionBytes", "32m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[sprobe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val docs = graft.Tables.t(spark, dir, "documents")
    // warmup JVM/codegen on the tiny tier
    locally {
      val d0 = graft.Tables.t(spark, "/root/testdata/sf0.001", "documents")
      val (m0, p0, r0) = graft.operators.CurationOps.nbModelFrames(
        d0, "lang", graft.operators.CurationOps.NbVocabCap)
      val mm0 = graft.operators.NbModel.collect(m0, p0); r0()
      graft.operators.CurationOps.nbScore(d0, mm0, "text")
        .write.mode("overwrite").format("noop").save()
    }
    for (rep <- 1 to 3) {
      val m = timed(s"train (rep $rep)") {
        val (model, prior, release) = graft.operators.CurationOps
          .nbModelFrames(docs, "lang", graft.operators.CurationOps.NbVocabCap)
        val mm = graft.operators.NbModel.collect(model, prior)
        release(); mm
      }
      timed(s"batch score+agg (rep $rep)") {
        graft.operators.CurationOps.nbScore(docs, m, "text")
          .groupBy(col("pred_cls"))
          .agg(count(lit(1)).as("n"))
          .write.mode("overwrite").format("noop").save()
      }
      timed(s"stream verdictCounts (rep $rep)") {
        graft.streaming.ClassifierStream.verdictCounts(
          graft.Tables.docsStream(spark, dir), m,
          queryName = s"sprobe_vc_${System.nanoTime()}")
      }
      timed(s"stream score, file sink (rep $rep)") {
        graft.streaming.ClassifierStream.drained(
          graft.Tables.docsStream(spark, dir), m,
          queryName = s"sprobe_dr_${System.nanoTime()}")
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
