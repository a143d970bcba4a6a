package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage accounting for the bench's ONCE-PER-SNAPSHOT stages (index
  * builds + layout writes) — the r18 optimization round's first
  * measurement: BENCH stageFirst entries sum to ~16.6 s of the 38 s
  * total, so the builds are the biggest lever left. Times each
  * stage's sub-steps independently on a fresh session (same confs as
  * graft.Bench). Usage: runMain graft.tools.StagesProbe [sfDir] */
object StagesProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.files.maxPartitionBytes", "32m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.DuckAliases.register(spark)
    def time[A](label: String)(f: => A): A = {
      spark.sparkContext.setJobDescription(label)
      val t0 = System.nanoTime()
      val r = f
      println(f"[stages] $label%-32s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      spark.sparkContext.setJobDescription(null)
      r
    }
    // ---- serving_index_stage sub-steps ----
    val eng = graft.Engine(spark)
    time("text: register") {
      eng.registerTable("p_docs", s"$sfDir/documents.parquet")
    }
    val tpath = s"${sys.props("java.io.tmpdir")}/probe_tix_" +
      s"${ProcessHandle.current.pid}"
    time("text: buildTextIndex") {
      eng.buildTextIndex("p_tix", "p_docs", tpath)
    }
    time("ann: register") {
      eng.registerTable("p_emb", s"$sfDir/embeddings.parquet")
    }
    import graft.operators.SimilarityOps
    val df = eng.table("p_emb")
      .select(col("vec_id"), col("embedding"))
    val n = time("ann: count")(df.count())
    val cents = time("ann: ivfCentroids (kmeans)") {
      val c = SimilarityOps.ivfCentroids(spark, df, SimilarityOps.ivfNlist(n))
      c.collect(); c
    }
    val assigned = time("ann: ivfAssign+pqTrain") {
      val a = SimilarityOps.ivfAssign(df, cents)
      val books = SimilarityOps.pqTrain(spark, a, cents)
      (a, books)
    }
    time("ann: pqEncode+write cells") {
      SimilarityOps.pqEncode(assigned._1, cents, assigned._2)
        .repartitionByRange(col("cell")).sortWithinPartitions("cell")
        .write.mode("overwrite")
        .option("parquet.block.size", 8L << 20)
        .parquet(s"$tpath/probe_cells")
    }
    time("ann: buildAnnIndex (full, as shipped)") {
      eng.buildAnnIndex("p_ann", "p_emb", pq = true)
    }
    // ---- layout stages ----
    import graft.Tables.t
    import graft.operators.BucketedOps
    time("bucket: lineitem write") {
      BucketedOps.writeBucketed(t(spark, sfDir, "lineitem"),
        "probe_bk_li", Seq("l_orderkey"))
    }
    time("bucket: orders write (year-part)") {
      BucketedOps.writeBucketed(t(spark, sfDir, "orders")
          .withColumn("o_year", year(col("o_orderdate"))),
        "probe_bk_o", Seq("o_orderkey"), partitionCol = Some("o_year"))
    }
    val ev = t(spark, sfDir, "events")
      .select("event_id", "ts", "user_id", "event_type", "value")
    time("zorder: writeZOrder (256 files)") {
      BucketedOps.writeZOrder(ev, "probe_bk_z")
    }
    time("timesort: writeSorted (256 files)") {
      BucketedOps.writeSorted(ev, "probe_bk_tl", col("ts"),
        BucketedOps.clusterFiles)
    }
    time("events_bucket: eventsByUser") {
      BucketedOps.writeBucketed(t(spark, sfDir, "events"),
        "probe_bk_ev", Seq("user_id"), sortCols = Seq("user_id", "ts"))
    }
    time("rollup: eventsMinuteRollup") {
      BucketedOps.writeBucketed(
        graft.operators.LayoutMaintenance.minutePartials(
          t(spark, sfDir, "events")),
        "probe_bk_evr", Seq("event_type"), buckets = BucketedOps.RollupBuckets,
        sortCols = Seq("event_type", "m"))
    }
    Seq("probe_bk_li", "probe_bk_o", "probe_bk_z", "probe_bk_tl",
      "probe_bk_ev", "probe_bk_evr")
      .foreach(n => spark.sql(s"DROP TABLE IF EXISTS $n"))
    spark.stop()
  }
}
