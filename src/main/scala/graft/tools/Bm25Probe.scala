package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Served-BM25 probe stage accounting (dev tool, feeds BENCH_NOTES):
  * separates the per-probe cost into its plan alternatives at a tier —
  * the 3-job classic plan (live df + stats aggregations), the one-job
  * literal-metadata plan, and the certified early-termination cut —
  * plus the raw slice-scan floor they sit on. The numbers behind the
  * r17 "one job and sublinear on common terms" work (VERDICT r16 #1).
  * Usage: runMain graft.tools.Bm25Probe <sfDir> */
object Bm25Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/benchdata/sf10")
    // optional: parquet block size (bytes) for the artifact build —
    // smaller row groups give the probes' (w, qi) predicates finer
    // min/max pruning grains at the cost of write amplification
    val blockSize = args.lift(1).map(_.toInt)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.files.maxPartitionBytes", "32m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val eng = graft.Engine(spark)
    blockSize.foreach { bs =>
      spark.sparkContext.hadoopConfiguration.setInt("parquet.block.size", bs)
      println(s"[bm25probe] parquet.block.size=$bs")
    }
    eng.registerTable("probe_docs", s"$sfDir/documents.parquet")
    val path = s"${sys.props("java.io.tmpdir")}/graft_bm25probe"
    val build = time { eng.buildTextIndex("bp_tix", "probe_docs", path) }
    val terms = graft.operators.TextOps.Bm25.terms
    val post = eng.table("bp_tix_postings")

    def bench(tag: String, reps: Int = 5)(f: => Unit): Unit = {
      f // warm
      println(f"[bm25probe] $sfDir $tag med$reps=${med((1 to reps)
        .map(_ => time(f)))}%.3f s")
    }
    println(f"[bm25probe] $sfDir build=$build%.2f s " +
      f"postings=${post.count()} slice=${post
        .filter(col("w").isin(terms: _*)).count()}")
    bench("slice-scan") {
      post.filter(col("w").isin(terms: _*)).agg(count(lit(1))).collect()
      ()
    }
    bench("classic-3job") {
      eng.bm25Matched("bp_tix", terms)
        .orderBy(col("bm25").desc, col("doc_id")).limit(10).collect()
      ()
    }
    bench("one-job-lit") {
      eng.litMatched("bp_tix", terms).get
        .orderBy(col("bm25").desc, col("doc_id")).limit(10).collect()
      ()
    }
    spark.conf.set("graft.bm25.fastPathMinRows", "0")
    bench("wand-cut") {
      assert(eng.fastBm25("bp_tix", terms, 10).isDefined)
    }
    spark.conf.unset("graft.bm25.fastPathMinRows")
    bench("serving-default") {
      eng.bm25Search("bp_tix", terms, 10).collect(); ()
    }
    // VERDICT r17 #7: what does a COLD probe pay when the cut cannot
    // certify? (an ad-hoc term set on a near-tied tail: phase-1 runs at
    // frac 0.25, fails certification, deepens to 0.5, fails again, and
    // the serving path falls to the one-job plan). Emulated by
    // deepening k: the k-th partial approaches the score plateau and
    // the suffix bound can't clear it. Cold = metadata + frac caches
    // dropped, the first-ever-probe cost a serving deployment sees.
    spark.conf.set("graft.bm25.fastPathMinRows", "0")
    val matchedDocs = eng.bm25Matched("bp_tix", terms).count()
    Seq(100, 1000, math.max(1000, (matchedDocs / 2).toInt)).distinct
      .foreach { k =>
        eng.invalidateTextCaches("bp_tix")
        var certified = false
        val t = time { certified =
          eng.fastBm25("bp_tix", terms, k).isDefined }
        // cost of the same result on the plan a decline falls to
        val tLit = time {
          eng.litMatched("bp_tix", terms).get
            .orderBy(col("bm25").desc, col("doc_id")).limit(k).collect()
          ()
        }
        println(f"[bm25probe] $sfDir cold-probe k=$k certified=" +
          f"$certified cut_or_decline=$t%.3f s one_job=$tLit%.3f s " +
          f"(decline waste = cut_or_decline when certified=false)")
      }
    spark.conf.unset("graft.bm25.fastPathMinRows")
    // the df-proportional contract on a genuinely rare term
    val rare = post.groupBy("w").agg(count(lit(1)).as("df"))
      .filter(col("df").between(1, 1000)).orderBy("w").limit(1)
      .collect().headOption
    rare.foreach { r =>
      bench(s"rare-term '${r.getString(0)}' (df=${r.getLong(1)})") {
        eng.bm25Search("bp_tix", Seq(r.getString(0)), 10).collect(); ()
      }
    }
    spark.stop()
  }
}
