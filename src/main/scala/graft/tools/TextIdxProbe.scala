package graft.tools

import org.apache.spark.sql.SparkSession

/** Inverted-index probe (dev tool, feeds BENCH_NOTES): separates the
  * once-per-snapshot BM25 index build from the per-query probe cost,
  * against the full-pass q165 formulation at the same tier — the
  * numbers behind the "per-query lexical cost is sublinear" claim.
  * Usage: runMain graft.tools.TextIdxProbe <sfDir> */
object TextIdxProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("benchdata/sf1")
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
    graft.functions.DuckAliases.register(spark)

    def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    val eng = graft.Engine(spark)
    eng.registerTable("probe_docs", s"$sfDir/documents.parquet")
    val path = s"${sys.props("java.io.tmpdir")}/graft_textidx_probe"

    val build = time {
      eng.buildTextIndex("probe_text", "probe_docs", path)
    }
    val terms = graft.operators.TextOps.Bm25.terms
    // warm codegen once untimed, then med-of-5 for both paths
    eng.bm25Search("probe_text", terms, 10).collect()
    val probe = med((1 to 5).map(_ => time {
      eng.bm25Search("probe_text", terms, 10).collect(); ()
    }))
    graft.operators.TextOps.Bm25.scored(spark, sfDir)
      .orderBy(org.apache.spark.sql.functions.col("bm25").desc,
        org.apache.spark.sql.functions.col("doc_id")).limit(10).collect()
    val full = med((1 to 5).map(_ => time {
      graft.operators.TextOps.Bm25.scored(spark, sfDir)
        .orderBy(org.apache.spark.sql.functions.col("bm25").desc,
          org.apache.spark.sql.functions.col("doc_id"))
        .limit(10).collect(); ()
    }))
    println(f"[textidx] $sfDir build=$build%.2f s  probe(med5)=$probe%.3f s" +
      f"  fullpass(med5)=$full%.3f s")
    // the q165 probe terms are deliberately COMMON (df ≈ N), so that
    // probe is df-linear by construction; a rare term shows the
    // df-proportional contract directly
    import org.apache.spark.sql.functions.{col, count, lit}
    val rare = eng.table("probe_text_postings").groupBy("w")
      .agg(count(lit(1)).as("df"))
      .filter(col("df").between(1, 1000)).orderBy("w").limit(1)
      .collect().headOption
    rare.foreach { r =>
      val (w, df) = (r.getString(0), r.getLong(1))
      eng.bm25Search("probe_text", Seq(w), 10).collect()
      val rp = med((1 to 5).map(_ => time {
        eng.bm25Search("probe_text", Seq(w), 10).collect(); ()
      }))
      println(f"[textidx] $sfDir rare-term probe '$w' (df=$df) " +
        f"med5=$rp%.3f s")
    }
    spark.stop()
  }
}
