package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the selectivity of the LOSSLESS size-band candidate prune on
  * the q41/q123 shingle pair stage (r19 verdict item 1): for Jaccard
  * J(A,B) = |A∩B|/|A∪B| ≤ min(|A|,|B|)/max(|A|,|B|), so a pair whose
  * size ratio is below the threshold can never reach it. Reports, per
  * band: co-occurrence rows surviving (the bytes the pair exchange
  * carries) and aggregated pairs surviving, vs the unpruned stage.
  * Usage: runMain graft.tools.BandProbe [sfDir] */
object BandProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "256m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sh = graft.operators.DedupOps.sharedShingles(spark, sfDir)
    val sz = sh.repartition(col("doc_id"))
      .groupBy("doc_id").agg(count(lit(1)).as("n"))
    // doc-size distribution
    val stats = sz.agg(count(lit(1)), min("n"), expr("percentile(n, 0.25)"),
      expr("percentile(n, 0.5)"), expr("percentile(n, 0.75)"), max("n")).head
    println(s"[band] docs=${stats.getLong(0)} nmin=${stats.getLong(1)} " +
      s"q25=${stats.getDouble(2)} med=${stats.getDouble(3)} " +
      s"q75=${stats.getDouble(4)} nmax=${stats.getLong(5)}")
    val shN = sh.join(broadcast(sz), Seq("doc_id"))
    val a = shN.toDF("id_a", "s", "na")
    val b = shN.toDF("id_b", "s", "nb")
    val coRows = a.join(b, Seq("s")).filter(col("id_a") < col("id_b"))
    def bandPred(j: Double) =
      col("na") >= lit(j) * col("nb") && col("nb") >= lit(j) * col("na")
    val counts = coRows.agg(
      count(lit(1)).as("co_all"),
      count_if(bandPred(0.4999)).as("co_b05"),
      count_if(bandPred(0.899)).as("co_b09")).head
    println(s"[band] co-occurrence rows: all=${counts.getLong(0)} " +
      s"band05=${counts.getLong(1)} band09=${counts.getLong(2)}")
    val pairs = coRows.select("id_a", "na", "id_b", "nb")
      .groupBy("id_a", "na", "id_b", "nb").agg(count(lit(1)).as("inter"))
    val jac = col("inter") * lit(1.0) / (col("na") + col("nb") - col("inter"))
    val pc = pairs.agg(count(lit(1)).as("p_all"),
      count_if(bandPred(0.4999)).as("p_b05"),
      count_if(bandPred(0.899)).as("p_b09"),
      count_if(jac >= 0.5).as("p_j05"),
      count_if(jac >= 0.9).as("p_j09")).head
    println(s"[band] aggregated pairs: all=${pc.getLong(0)} " +
      s"band05=${pc.getLong(1)} band09=${pc.getLong(2)} " +
      s"jac05=${pc.getLong(3)} jac09=${pc.getLong(4)}")
    spark.stop()
  }
}
