package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t

/** JoinProbe round 3: (a) the q12 adoption candidate — repartition-first
  * pre-agg with the ORIGINAL join shape — row-compared against the
  * shipped q12; (b) pure-exchange floor rows for q68/q69: time JUST the
  * join-key exchange of each SHJ input (repartition + noop), so the SHJ
  * stage delta from JoinProbe decomposes into exchange vs build/probe. */
object JoinProbe3 {
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

    def run(name: String, mk: () => DataFrame): Double = {
      mk().write.mode("overwrite").format("noop").save()
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        mk().write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      val med = times(times.size / 2)
      println(f"[jp3] $name%-28s med $med%6.3f min ${times.head}%6.3f " +
        f"max ${times.last}%6.3f")
      med
    }

    // q12 with ONLY the repartition-first change (join shape untouched)
    def q12B = {
      val li = t(spark, sfDir, "lineitem"); val o = t(spark, sfDir, "orders")
      val c = t(spark, sfDir, "customer")
      val perOrder = li
        .select(col("l_orderkey"),
          (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("r0"))
        .repartition(col("l_orderkey"))
        .groupBy("l_orderkey").agg(sum(col("r0")).as("rev"))
      perOrder.join(o.hint("shuffle_hash"),
          col("l_orderkey") === col("o_orderkey"))
        .join(graft.operators.NamedQuery.maybeBroadcast(c),
          col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(round(sum(col("rev")), 2).as("revenue"),
          count(lit(1)).as("n_orders"))
    }
    def q12Cur = graft.SparkEntry.queries("q12_join_agg")(spark, sfDir)
    val a = q12Cur.collect().map(_.toString).sorted.toSeq
    val b = q12B.collect().map(_.toString).sorted.toSeq
    println(s"[jp3] q12_repart_only identical=${a == b}")
    if (a != b) a.zip(b).filter(p => p._1 != p._2).take(3)
      .foreach { case (x, y) => println(s"[jp3]   cur=$x\n[jp3]   new=$y") }
    run("q12_cur", () => q12Cur)
    run("q12_repart_only", () => q12B)

    // exchange floors: just shuffle each SHJ input on its join key
    def li68 = t(spark, sfDir, "lineitem")
      .filter(col("l_shipdate") > lit("1998-01-01").cast("timestamp"))
      .select("l_orderkey", "l_extendedprice", "l_discount")
    def oc68 = t(spark, sfDir, "orders")
      .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      .join(broadcast(t(spark, sfDir, "customer")
        .filter(col("c_mktsegment") === "BUILDING")),
        col("o_custkey") === col("c_custkey"))
      .select("o_orderkey", "o_orderdate", "o_orderpriority")
    val rg = t(spark, sfDir, "region").filter(col("r_name") === "ASIA")
    val asiaN = t(spark, sfDir, "nation")
      .join(broadcast(rg), col("n_regionkey") === col("r_regionkey"))
      .select("n_nationkey", "n_name")
    def suA = t(spark, sfDir, "supplier")
      .join(broadcast(asiaN), col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey", "s_nationkey")
    def li69 = t(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
      .join(broadcast(suA), col("l_suppkey") === col("s_suppkey"))
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"),
        col("s_nationkey"))
    def o69 = t(spark, sfDir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp")
        && col("o_orderdate") < lit("1999-01-01").cast("timestamp"))
      .select("o_orderkey", "o_custkey")
    println(s"[jp3] rows li68=${li68.count()} oc68=${oc68.count()} " +
      s"li69=${li69.count()} o69=${o69.count()}")
    run("x_li68_exchange", () => li68.repartition(col("l_orderkey")))
    run("x_oc68_exchange", () => oc68.repartition(col("o_orderkey")))
    run("x_li69_exchange", () => li69.repartition(col("l_orderkey")))
    run("x_o69_exchange", () => o69.repartition(col("o_orderkey")))
    spark.stop()
  }
}
