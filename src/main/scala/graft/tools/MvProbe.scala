package graft.tools

import org.apache.spark.sql.SparkSession

/** Scale-tier probe for the materialized-aggregate rewrite (dev tool,
  * feeds BENCH_NOTES): on one tier, time (a) the MV build, (b) the
  * covered dashboard aggregate computed directly from the fact table,
  * and (c) the same SQL routed through the engine, which rewrites it
  * to re-aggregate the MV partials. Median-of-N with spread, same
  * measurement discipline as [[graft.Bench]]. */
object MvProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "benchdata/sf10")
    val repeats = sys.env.getOrElse("SPARK_GRAFT_REPEATS", "5").toInt
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
    val engine = graft.Engine(spark)

    val base = "mvprobe_lineitem"
    val mv = "mvprobe_li_agg"
    // registerTable binds the parquet scan (no copy) — the probe
    // measures the aggregate, not a table rewrite
    engine.registerTable(base, graft.Tables.t(spark, sfDir, "lineitem"))
    val q = s"""SELECT l_returnflag, l_linestatus,
               |round(sum(l_quantity), 2) AS sum_qty,
               |round(avg(l_extendedprice), 4) AS avg_price,
               |round(min(l_discount), 2) AS min_disc,
               |round(max(l_tax), 2) AS max_tax,
               |count(*) AS n
               |FROM $base WHERE l_returnflag IN ('A', 'R')
               |GROUP BY l_returnflag, l_linestatus""".stripMargin

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def r3(v: Double) = math.round(v * 1000) / 1000.0
    def bench(label: String)(f: => Unit): Unit = {
      val ts = (1 to repeats).map(_ => time(f)).sorted
      println(s"[mvprobe] $label: median ${r3(ts(ts.size / 2))} s " +
        s"spread [${r3(ts.head)}, ${r3(ts.last)}]")
    }

    // warmup (codegen paths for both plans)
    spark.sql(q).write.mode("overwrite").format("noop").save()

    val buildS = time(engine.createMaterializedAggregate(mv, base,
      dims = Seq("l_returnflag", "l_linestatus"),
      measures = Seq("l_quantity", "l_extendedprice", "l_discount",
        "l_tax"),
      path = s"${sys.props("java.io.tmpdir")}/graft_mvprobe_" +
        s"${ProcessHandle.current.pid}"))
    println(s"[mvprobe] mv_build: ${r3(buildS)} s (one-time, " +
      "amortized over every covered query until the next base DML)")
    engine.sql(q).write.mode("overwrite").format("noop").save() // warm

    bench("direct_fact_agg") {
      spark.sql(q).write.mode("overwrite").format("noop").save()
    }
    bench("mv_rewritten_agg") {
      engine.sql(q).write.mode("overwrite").format("noop").save()
      spark.catalog.clearCache()
    }

    // daily-ingest cadence: append a ~0.1% delta, then compare the two
    // refresh paths — incremental (delta partials merged into the
    // artifact) vs a from-scratch rebuild over the grown base
    val deltaRows = math.max(1000L, engine.table(base).count() / 1000)
    engine.insertInto(base, engine.table(base).limit(deltaRows.toInt))
    val incrS = time {
      val mode = engine.refreshMaterializedAggregate(mv)
      require(mode == "incremental", s"expected incremental, got $mode")
    }
    println(s"[mvprobe] incremental_refresh (+$deltaRows rows): " +
      s"${r3(incrS)} s")
    val rebuildS = time(engine.createMaterializedAggregate(s"${mv}_rb",
      base, dims = Seq("l_returnflag", "l_linestatus"),
      measures = Seq("l_quantity", "l_extendedprice", "l_discount",
        "l_tax"),
      path = s"${sys.props("java.io.tmpdir")}/graft_mvprobe_rb_" +
        s"${ProcessHandle.current.pid}"))
    println(s"[mvprobe] full_rebuild (same base state): ${r3(rebuildS)} s")
    spark.stop()
  }
}
