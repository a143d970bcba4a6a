package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Operational cost of the serving-index maintenance verbs (dev tool,
  * feeds BENCH_NOTES): build an index at a tier, append a refresh
  * batch, then time OPTIMIZE TEXT/ANN INDEX against a from-scratch
  * rebuild — the number an operator uses to pick a compaction cadence.
  * Usage: runMain graft.tools.OptProbe <sfDir> */
object OptProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("benchdata/sf10")
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
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val eng = graft.Engine(spark)
    val docs = graft.Tables.t(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    eng.registerTable("op_docs", docs.filter(col("doc_id") % 20 =!= 0))
    eng.registerTable("op_docs_all", docs)
    val base = java.nio.file.Files.createTempDirectory("graft_optp")
      .toString
    val tBuild = time(eng.buildTextIndex("op_tix", "op_docs",
      s"$base/tix"))
    val tRefresh = time(eng.refreshTextIndex("op_tix", "op_docs_all",
      s"$base/tix"))
    val tOpt = time(eng.optimizeTextIndex("op_tix"))
    println(f"[optprobe] $sfDir text: build=$tBuild%.2f s  " +
      f"refresh(5%%)=$tRefresh%.2f s  optimize=$tOpt%.2f s")
    val vecs = graft.Tables.t(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    eng.registerTable("op_vecs", vecs.filter(col("vec_id") % 20 =!= 0))
    val aBuild = time(eng.buildAnnIndex("op_aix", "op_vecs", pq = true,
      path = s"$base/aix"))
    // grow the base table in place (the production ingest shape), then
    // refresh — the anti-join picks up the appended 5%
    eng.registerTable("op_vecs", vecs)
    val aRefresh = time(
      eng.refreshAnnIndex("op_aix", "op_vecs"))
    val aOpt = time(eng.optimizeAnnIndex("op_aix"))
    println(f"[optprobe] $sfDir ann:  build=$aBuild%.2f s  " +
      f"refresh=$aRefresh%.2f s  optimize=$aOpt%.2f s")
    spark.stop()
  }
}
