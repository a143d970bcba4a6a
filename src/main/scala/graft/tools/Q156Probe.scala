package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t
import graft.operators.{BucketedOps, NamedQuery}

/** q156 (bucketed TPC-H Q5) floor experiment — the two levers the r8
  * stage accounting left on the table:
  *
  *  1. bucketed SHUFFLE_HASH join in place of the SMJ: both fact scans
  *     already report the join's hash partitioning, so an SHJ also runs
  *     with zero exchanges but skips the merge-stream over sorted runs
  *     (per-partition hash build of the date-filtered orders instead);
  *  2. orders layout partitioned by o_year AND bucketed on o_orderkey:
  *     the bench predicate (1996 ≤ year < 1999) prunes 4/7 of the
  *     orders files at listing time — the layout decision a warehouse
  *     makes for its hottest date filter — while the bucket columns
  *     keep the join exchange-free.
  *
  * Usage: SPARK_GRAFT_SF_DIR=benchdata/sf10 runMain graft.tools.Q156Probe
  */
object Q156Probe {

  /** q156 body, parameterized over the fact inputs and join strategy. */
  def q156(s: SparkSession, d: String, li0: DataFrame, o0: DataFrame,
      shj: Boolean): DataFrame = {
    val r = t(s, d, "region").filter(col("r_name") === "ASIA")
    val asiaN = t(s, d, "nation")
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .select("n_nationkey", "n_name")
    val suBase = t(s, d, "supplier")
    val suA = suBase
      .join(broadcast(asiaN), col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey", "s_nationkey")
    val cBase = t(s, d, "customer")
    val cA = cBase
      .join(broadcast(asiaN), col("c_nationkey") === col("n_nationkey"))
      .select("c_custkey", "c_nationkey")
    val o1 = o0.select("o_orderkey", "o_custkey")
    val o = if (shj) o1.hint("shuffle_hash") else o1
    val li = li0.select("l_orderkey", "l_suppkey", "l_extendedprice",
      "l_discount")
    val bcast = 100L << 20
    li.join(NamedQuery.maybeBroadcast(suA, suBase, bcast),
        col("l_suppkey") === col("s_suppkey"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(NamedQuery.maybeBroadcast(cA, cBase, bcast),
        col("o_custkey") === col("c_custkey")
        && col("s_nationkey") === col("c_nationkey"))
      .join(broadcast(asiaN), col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
        .as("revenue"))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "benchdata/sf10")
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

    def time[A](f: => A): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def med(mk: => DataFrame, label: String, n: Int = 5): Unit = {
      val ts = (1 to n).map { _ =>
        time(mk.write.mode("overwrite").format("noop").save())
      }.sorted
      println(f"[q156probe] $label%-28s ${ts(n / 2)}%6.2f s  " +
        f"[${ts.head}%.2f, ${ts.last}%.2f]")
    }

    // NOTE: since the r9 layout change, factPair's orders table is
    // ALREADY year-partitioned; the probe writes its own PLAIN bucketed
    // orders copy as the A/B baseline.
    val layoutT = time(BucketedOps.warmLayout(spark, sfDir))
    println(f"[q156probe] layout_write $layoutT%6.2f s")
    val (tli, to) = BucketedOps.factPair(spark, sfDir)

    val plain = s"bk_op_${ProcessHandle.current.pid}_" +
      sfDir.replaceAll("[^a-zA-Z0-9]", "_")
    val plainT = time(BucketedOps.writeBucketed(
      t(spark, sfDir, "orders"), plain, Seq("o_orderkey")))
    println(f"[q156probe] plain_layout_write $plainT%6.2f s")

    val dateCond = col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
      col("o_orderdate") < lit("1999-01-01").cast("timestamp")

    def liB = spark.table(tli)
    def oB = spark.table(plain).filter(dateCond)

    // warmup
    q156(spark, sfDir, liB, oB, shj = false)
      .write.mode("overwrite").format("noop").save()

    med(q156(spark, sfDir, liB, oB, shj = false), "baseline_smj")
    med(q156(spark, sfDir, liB, oB, shj = true), "bucketed_shj")

    // year-partitioned + bucketed orders: the layout factPair now writes
    def oY = spark.table(to)
      .filter(col("o_year") >= 1996 && col("o_year") <= 1998 && dateCond)
    med(q156(spark, sfDir, liB, oY, shj = false), "yearpart_smj")
    med(q156(spark, sfDir, liB, oY, shj = true), "yearpart_shj")

    // sanity: all variants row-identical
    val base = q156(spark, sfDir, liB, oB, shj = false)
      .collect().map(_.toString).sorted.toSeq
    for ((v, l) <- Seq(
        (q156(spark, sfDir, liB, oB, shj = true), "shj"),
        (q156(spark, sfDir, liB, oY, shj = false), "ysmj"),
        (q156(spark, sfDir, liB, oY, shj = true), "yshj"))) {
      val got = v.collect().map(_.toString).sorted.toSeq
      println(s"[q156probe] variant $l identical=${got == base}")
    }
    // exchange count on the fact path per variant
    for ((v, l) <- Seq(
        (q156(spark, sfDir, liB, oB, shj = true), "shj"),
        (q156(spark, sfDir, liB, oY, shj = true), "yshj"))) {
      val plan = v.queryExecution.executedPlan.toString
      val nEx = "Exchange hashpartitioning".r.findAllIn(plan).size
      println(s"[q156probe] $l hash-exchanges=$nEx")
    }
    // q154 A/B: the unfiltered-orders consumer must not pay for the
    // year partitioning (it reads every year; 7× more files)
    def q154(o: DataFrame): DataFrame = {
      val li = spark.table(tli)
      val c = t(spark, sfDir, "customer")
      val perOrder = li.groupBy("l_orderkey")
        .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("rev"))
      perOrder.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(NamedQuery.maybeBroadcast(c),
          col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(round(sum(col("rev")), 2).as("revenue"),
          count(lit(1)).as("n_orders"))
    }
    med(q154(spark.table(plain)), "q154_plain_orders")
    med(q154(spark.table(to).drop("o_year")), "q154_yearpart_orders")

    // q155 A/B: SMJ vs SHJ on the bucketed li ⋈ (orders⋈customer) join
    def q155(shj: Boolean): DataFrame = {
      val c = t(spark, sfDir, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
      val o = spark.table(to)
        .filter(col("o_year") <= 1997 &&
          col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      val li = spark.table(tli)
        .filter(col("l_shipdate") > lit("1998-01-01").cast("timestamp"))
      val oc0 = o.join(NamedQuery.maybeBroadcast(c,
          t(spark, sfDir, "customer"), 100L << 20),
          col("o_custkey") === col("c_custkey"))
        .select("o_orderkey", "o_orderdate", "o_orderpriority")
      val oc = if (shj) oc0.hint("shuffle_hash") else oc0
      li.join(oc, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey"),
          col("o_orderdate").cast("date").as("odate"),
          col("o_orderpriority"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"))
        .select("l_orderkey", "revenue", "odate", "o_orderpriority")
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    }
    med(q155(shj = false), "q155_smj")
    med(q155(shj = true), "q155_shj")

    // r16 verdict item 3: the 64-bucket variant — double the files per
    // fact table (finer SMJ grains, two scan waves on 32 cores) against
    // the same zero-exchange plan shape
    val pid = ProcessHandle.current.pid
    val (li64, o64) = (s"bk_li64_$pid", s"bk_o64_$pid")
    val t64 = time {
      BucketedOps.writeBucketed(t(spark, sfDir, "lineitem"), li64,
        Seq("l_orderkey"), buckets = 64)
      BucketedOps.writeBucketed(t(spark, sfDir, "orders")
          .withColumn("o_year", year(col("o_orderdate"))), o64,
        Seq("o_orderkey"), buckets = 64, partitionCol = Some("o_year"))
    }
    println(f"[q156probe] 64bucket_layout_write $t64%6.2f s")
    def o64Y = spark.table(o64)
      .filter(col("o_year") >= 1996 && col("o_year") <= 1998 && dateCond)
    q156(spark, sfDir, spark.table(li64), o64Y, shj = false)
      .write.mode("overwrite").format("noop").save()
    med(q156(spark, sfDir, spark.table(li64), o64Y, shj = false),
      "q156_64bucket_smj")
    med(q156(spark, sfDir, spark.table(li64), o64Y, shj = true),
      "q156_64bucket_shj")
    val got64 = q156(spark, sfDir, spark.table(li64), o64Y, shj = false)
      .collect().map(_.toString).sorted.toSeq
    println(s"[q156probe] variant 64bucket identical=${got64 == base}")

    Seq(plain, li64, o64)
      .foreach(n => spark.sql(s"DROP TABLE IF EXISTS $n"))
    spark.stop()
  }
}
