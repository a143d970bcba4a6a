package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t
import graft.operators.BucketedOps

/** Round-10 stage accounting (VERDICT r9 item 5): attribute q155/q156's
  * residual to stages shared with q06's scan constant, and measure the
  * AQE-barrier cost on the exchange-free bucketed plans. Each prefix is
  * a runnable plan; successive deltas attribute wall time. */
object StageAccount {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "benchdata/sf10")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPEATS", "5").toInt
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
    BucketedOps.warmLayout(spark, sfDir)
    val (tli, to) = BucketedOps.factPair(spark, sfDir)

    def liScan156 = spark.table(tli)
      .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    def oScan156 = spark.table(to)
      .filter(col("o_year").between(1996, 1998)
        && col("o_orderdate") >= lit("1996-01-01").cast("timestamp")
        && col("o_orderdate") < lit("1999-01-01").cast("timestamp"))
      .select("o_orderkey", "o_custkey")
    def liScan155 = spark.table(tli)
      .filter(col("l_shipdate") > lit("1998-01-01").cast("timestamp"))
      .select("l_orderkey", "l_extendedprice", "l_discount")
    def q06Scan = t(spark, sfDir, "lineitem")
      .select("l_returnflag", "l_linestatus", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax")

    val variants: Seq[(String, () => DataFrame)] = Seq(
      "s_li156_scan" -> (() => liScan156),
      "s_o156_scan" -> (() => oScan156),
      "s_li155_scan" -> (() => liScan155),
      "s_q06_scan" -> (() => q06Scan),
      "full_q06" -> (() =>
        graft.SparkEntry.queries("q06_tpch_q1")(spark, sfDir)),
      "full_q155" -> (() =>
        graft.SparkEntry.queries("q155_tpch_q3_bucketed")(spark, sfDir)),
      "full_q156" -> (() =>
        graft.SparkEntry.queries("q156_tpch_q5_bucketed")(spark, sfDir)))

    def run(name: String, mk: () => DataFrame): Unit = {
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        mk().write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"[stage] $name%-16s med ${times(times.size / 2)}%6.3f " +
        f"min ${times.head}%6.3f max ${times.last}%6.3f")
    }

    variants.foreach { case (_, mk) =>
      mk().write.mode("overwrite").format("noop").save()
    }
    variants.foreach { case (n, mk) => run(n, mk) }
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    Seq("full_q155_noaqe" -> variants(5)._2,
      "full_q156_noaqe" -> variants(6)._2,
      "full_q06_noaqe" -> variants(4)._2).foreach { case (n, mk) =>
      mk().write.mode("overwrite").format("noop").save(); run(n, mk)
    }

    // q156 join-prefix attribution (r10: the scan stages are only ~30%
    // of q156, so attribute the probe chain join by join; each prefix
    // is a runnable plan, successive deltas = that join's cost)
    val r = t(spark, sfDir, "region").filter(col("r_name") === "ASIA")
    val asiaN = t(spark, sfDir, "nation")
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .select("n_nationkey", "n_name")
    val suA = t(spark, sfDir, "supplier")
      .join(broadcast(asiaN), col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey", "s_nationkey")
    val cA = t(spark, sfDir, "customer")
      .join(broadcast(asiaN), col("c_nationkey") === col("n_nationkey"))
      .select("c_custkey", "c_nationkey")
    def p2SuppJoin = liScan156
      .join(broadcast(suA), col("l_suppkey") === col("s_suppkey"))
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"),
        col("s_nationkey"))
    def p3OrdersJoin = p2SuppJoin
      .join(oScan156.hint("shuffle_hash"),
        col("l_orderkey") === col("o_orderkey"))
    def p4Full = p3OrdersJoin
      .join(broadcast(cA), col("o_custkey") === col("c_custkey")
        && col("s_nationkey") === col("c_nationkey"))
      .join(broadcast(asiaN), col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
        .as("revenue"))
    val prefixes: Seq[(String, () => DataFrame)] = Seq(
      "p1_li_scan" -> (() => liScan156),
      "p2_supp_bjoin" -> (() => p2SuppJoin),
      "p3_orders_shj" -> (() => p3OrdersJoin),
      "p4_full_q156" -> (() => p4Full))
    prefixes.foreach { case (_, mk) =>
      mk().write.mode("overwrite").format("noop").save()
    }
    prefixes.foreach { case (n, mk) => run(n, mk) }

    // bucket-count lever (verdict r9 item 5): 64 buckets = 2 task waves
    // per core on this box; A/B against the 32-bucket layout above
    val suf64 = s"bk64_${ProcessHandle.current.pid}_" +
      sfDir.replaceAll("[^a-zA-Z0-9]", "_")
    val (tli64, to64) = (s"${suf64}_li", s"${suf64}_o")
    val t64 = {
      val t0 = System.nanoTime()
      BucketedOps.writeBucketed(t(spark, sfDir, "lineitem"), tli64,
        Seq("l_orderkey"), buckets = 64)
      BucketedOps.writeBucketed(t(spark, sfDir, "orders")
          .withColumn("o_year", year(col("o_orderdate"))),
        to64, Seq("o_orderkey"), buckets = 64, partitionCol = Some("o_year"))
      (System.nanoTime() - t0) / 1e9
    }
    println(f"[stage] layout64_write   $t64%6.3f s")
    def li64Scan = spark.table(tli64)
      .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    def o64Scan = spark.table(to64)
      .filter(col("o_year").between(1996, 1998)
        && col("o_orderdate") >= lit("1996-01-01").cast("timestamp")
        && col("o_orderdate") < lit("1999-01-01").cast("timestamp"))
      .select("o_orderkey", "o_custkey")
    def q156b64 = li64Scan
      .join(broadcast(suA), col("l_suppkey") === col("s_suppkey"))
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"),
        col("s_nationkey"))
      .join(o64Scan.hint("shuffle_hash"),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cA), col("o_custkey") === col("c_custkey")
        && col("s_nationkey") === col("c_nationkey"))
      .join(broadcast(asiaN), col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
        .as("revenue"))
    q156b64.write.mode("overwrite").format("noop").save()
    run("q156_buckets64", () => q156b64)
    val sameRows = q156b64.collect().map(_.toString).sorted.toSeq ==
      p4Full.collect().map(_.toString).sorted.toSeq
    println(s"[stage] buckets64 identical=$sameRows")

    // r10 reorder lever: q155 pre-joins customer into the SHJ BUILD
    // side; q156 as written probes customer AFTER the fact join (46% of
    // its time). Reordered: orders⋈customer first (build shrinks to
    // ASIA-only rows), nation-match folded into the SHJ condition so
    // non-matching probe rows never materialize.
    def q156Reordered(li0: DataFrame, o0: DataFrame): DataFrame = {
      val oc = o0.join(broadcast(cA), col("o_custkey") === col("c_custkey"))
        .select("o_orderkey", "c_nationkey")
        .hint("shuffle_hash")
      li0.join(broadcast(suA), col("l_suppkey") === col("s_suppkey"))
        .select(col("l_orderkey"), col("l_extendedprice"),
          col("l_discount"), col("s_nationkey"))
        // nation match as a POST-JOIN filter (same codegen stage), not a
        // join key: a second equi-key would invalidate the bucket
        // partitioning and re-introduce a full shuffle of both sides
        .join(oc, col("l_orderkey") === col("o_orderkey"))
        .filter(col("s_nationkey") === col("c_nationkey"))
        .join(broadcast(asiaN), col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"))
    }
    def q156r32 = q156Reordered(liScan156, oScan156)
    q156r32.write.mode("overwrite").format("noop").save()
    run("q156_reorder_b32", () => q156r32)
    val sameR = q156r32.collect().map(_.toString).sorted.toSeq ==
      p4Full.collect().map(_.toString).sorted.toSeq
    println(s"[stage] reorder identical=$sameR")
    val nEx = "Exchange hashpartitioning".r
      .findAllIn(q156r32.queryExecution.executedPlan.toString).size
    println(s"[stage] reorder hash-exchanges=$nEx")

    // subset co-partitioning: the optimizer folds the nation filter back
    // into the join as a second equi-key; with
    // requireAllClusterKeysForCoPartition=false the single-bucket-key
    // layout (index 0 on both sides) still co-partitions the two-key
    // join — zero fact exchange AND the nation match prunes during the
    // probe, so only final ASIA rows ever materialize.
    spark.conf.set("spark.sql.requireAllClusterKeysForCoPartition", "false")
    q156r32.write.mode("overwrite").format("noop").save()
    run("q156_reorder_subsetco", () => q156r32)
    val sameR2 = q156r32.collect().map(_.toString).sorted.toSeq ==
      p4Full.collect().map(_.toString).sorted.toSeq
    val nEx2 = "Exchange hashpartitioning".r
      .findAllIn(q156r32.queryExecution.executedPlan.toString).size
    println(s"[stage] subsetco identical=$sameR2 hash-exchanges=$nEx2")
    spark.conf.set("spark.sql.requireAllClusterKeysForCoPartition", "true")
    spark.sql(s"DROP TABLE IF EXISTS $tli64")
    spark.sql(s"DROP TABLE IF EXISTS $to64")
    spark.stop()
  }
}
