package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Sub-step accounting inside the two heaviest bench stages
  * (serving_index_stage, zorder_stage) with a warm repeat, plus a
  * sequential-vs-threaded A/B for the independent text/ANN builds
  * (guide §2.6 — overlap independent jobs). Probe-only mimic of the
  * build pipelines; the shipped code paths stay in EngineIndexes. */
object StagesProbe2 {
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
      // A/B hook: FOC=2 switches the MR output committer to task-side
      // renames (v2) for the many-file layout writes
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version",
        sys.env.getOrElse("FOC", "1"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.DuckAliases.register(spark)
    val tmp = sys.props("java.io.tmpdir") +
      s"/probe2_${ProcessHandle.current.pid}"
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[p2] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    (1 to 2).foreach { rep =>
      // ---- text index build, decomposed (mimics writeTextIndex) ----
      val path = s"$tmp/tix$rep"
      val post = docs.select(col("doc_id"),
          graft.functions.TokenCount.tokenCount(col("text")).cast("long")
            .as("dl"),
          explode(split(col("text"), " ")).as("w"))
        .groupBy("w", "doc_id").agg(count(lit(1)).as("tf"),
          first(col("dl")).as("dl"))
        .withColumn("qi", least(lit(63), greatest(lit(0),
          floor(log(2.0, col("dl").cast("double") / col("tf")) * 8)))
          .cast("int"))
      time(s"[$rep] text: postings sort+write") {
        post.repartitionByRange(col("w"))
          .sortWithinPartitions("w", "qi", "doc_id")
          .write.mode("overwrite")
          .option("parquet.block.size", 8L << 20)
          .parquet(s"$path/postings")
      }
      time(s"[$rep] text: doclens write") {
        docs.select(col("doc_id"),
            graft.functions.TokenCount.tokenCount(col("text")).cast("long")
              .as("dl"))
          .write.mode("overwrite").parquet(s"$path/doclens")
      }
      val postR = spark.read.parquet(s"$path/postings")
      time(s"[$rep] text: meta termstats") {
        postR.groupBy("w").agg(count(lit(1)).as("df"),
            max("tf").as("max_tf"), min("dl").as("min_dl"))
          .repartitionByRange(col("w")).sortWithinPartitions("w")
          .write.mode("overwrite").parquet(s"$path/termstats")
      }
      time(s"[$rep] text: meta impacts") {
        postR.groupBy("w", "qi").agg(count(lit(1)).as("cnt"))
          .repartitionByRange(col("w")).sortWithinPartitions("w", "qi")
          .write.mode("overwrite").parquet(s"$path/impacts")
      }
      time(s"[$rep] text: meta stats") {
        spark.read.parquet(s"$path/doclens")
          .agg(count(lit(1)).as("n"), sum("dl").as("sumdl")).coalesce(1)
          .write.mode("overwrite").parquet(s"$path/stats")
      }
      // fused alternative: impacts first, termstats folded from it
      time(s"[$rep] text: FUSED impacts->termstats") {
        val im = postR.groupBy("w", "qi").agg(count(lit(1)).as("cnt"),
          max("tf").as("max_tf"), min("dl").as("min_dl"))
        im.cache()
        im.select("w", "qi", "cnt")
          .repartitionByRange(col("w")).sortWithinPartitions("w", "qi")
          .write.mode("overwrite").parquet(s"$path/impacts2")
        im.groupBy("w").agg(sum("cnt").as("df"),
            max("max_tf").as("max_tf"), min("min_dl").as("min_dl"))
          .repartitionByRange(col("w")).sortWithinPartitions("w")
          .write.mode("overwrite").parquet(s"$path/termstats2")
        im.unpersist()
      }
      // ---- ANN build, decomposed ----
      import graft.operators.SimilarityOps
      val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
        .select(col("vec_id"), col("embedding"))
      val n = time(s"[$rep] ann: count")(e.count())
      val cents = time(s"[$rep] ann: ivfCentroids (MLlib kmeans)") {
        val c = SimilarityOps.ivfCentroids(spark, e,
          SimilarityOps.ivfNlist(n))
        c.collect(); c
      }
      val asg = time(s"[$rep] ann: ivfAssign") {
        SimilarityOps.ivfAssign(e, cents)
      }
      val books = time(s"[$rep] ann: pqTrain")(
        SimilarityOps.pqTrain(spark, asg, cents))
      time(s"[$rep] ann: pqEncode+write") {
        SimilarityOps.pqEncode(asg, cents, books)
          .repartitionByRange(col("cell")).sortWithinPartitions("cell")
          .write.mode("overwrite")
          .option("parquet.block.size", 8L << 20)
          .parquet(s"$path/cells")
      }
      // ---- zorder write, decomposed ----
      import graft.operators.BucketedOps
      val ev = graft.Tables.t(spark, sfDir, "events")
        .select("event_id", "ts", "user_id", "event_type", "value")
      val b = time(s"[$rep] z: bounds agg") {
        val r = ev.agg(min("user_id"), max("user_id"),
          expr("unix_micros(min(ts))"), expr("unix_micros(max(ts))")).head
        BucketedOps.ZBounds(r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3))
      }
      val withZ = ev.withColumn("z", graft.functions.Morton.zValue(
        graft.functions.Morton.rank16(col("user_id"), b.minU, b.maxU),
        graft.functions.Morton.rank16(expr("unix_micros(ts)"), b.minT,
          b.maxT)))
      time(s"[$rep] z: rangepart sort write parquet 256") {
        withZ.repartitionByRange(256, col("z"))
          .sortWithinPartitions(col("z"))
          .write.mode("overwrite")
          .option("parquet.block.size", (4L << 20).toString)
          .parquet(s"$path/zdir")
      }
      time(s"[$rep] z: fixed-grid part sort write parquet 256") {
        withZ.withColumn("pid", shiftright(col("z"), 24))
          .repartition(256, col("pid"))
          .sortWithinPartitions(col("z"))
          .drop("pid")
          .write.mode("overwrite")
          .option("parquet.block.size", (4L << 20).toString)
          .parquet(s"$path/zdir2")
      }
      time(s"[$rep] z: saveAsTable variant 256") {
        withZ.repartitionByRange(256, col("z"))
          .sortWithinPartitions(col("z"))
          .write.mode("overwrite")
          .option("parquet.block.size", (4L << 20).toString)
          .saveAsTable(s"probe2_z_$rep")
      }
      spark.sql(s"DROP TABLE IF EXISTS probe2_z_$rep")
    }
    // ---- sequential vs threaded full builds (fresh names) ----
    val eng = graft.Engine(spark)
    eng.registerTable("p2_docs", s"$sfDir/documents.parquet")
    eng.registerTable("p2_emb", s"$sfDir/embeddings.parquet")
    time("A/B: sequential text+ann builds") {
      eng.buildTextIndex("p2_t1", "p2_docs", s"$tmp/seq_t")
      eng.buildAnnIndex("p2_a1", "p2_emb", pq = true)
    }
    time("A/B: threaded text||ann builds") {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
      try {
        val fs = Seq(
          pool.submit(new Runnable { def run(): Unit =
            eng.buildTextIndex("p2_t2", "p2_docs", s"$tmp/thr_t") }),
          pool.submit(new Runnable { def run(): Unit =
            eng.buildAnnIndex("p2_a2", "p2_emb", pq = true) }))
        fs.foreach(_.get())
      } finally pool.shutdown()
    }
    spark.stop()
  }
}
