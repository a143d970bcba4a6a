package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{NamedQuery, SimilarityOps}

/** Measures the ANN audit quantities (LSH coverage, LSH mean gap, IVF
  * recall@10) as NUMBERS, per sf tier — the q121/q122 floors are set to
  * about half the measured margin, and this probe is how those numbers
  * are re-derived when the index parameters change.
  * Usage: runMain graft.tools.AnnFloorProbe <sfDir> [<sfDir>...] */
object AnnFloorProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.foreach { d =>
      val e = graft.Tables.t(spark, d, "embeddings")
        .select("vec_id", "embedding")
      val probes = e.orderBy("vec_id").limit(100).toDF("qid", "q_emb")
      val best = e.crossJoin(broadcast(probes))
        .filter(col("vec_id") =!= col("qid"))
        .groupBy("qid")
        .agg(max(graft.functions.CosineSimilarity.cosineSim(col("q_emb"), col("embedding")))
          .as("best_cos"))
      val lsh = SimilarityOps.annLsh.fn(spark, d)
        .select("vec_id", "cos_sim").cache()
      val cov = e.join(lsh, Seq("vec_id"), "left_outer")
        .agg((count(col("cos_sim")) * 1.0 / count(lit(1))).as("coverage"))
        .head.getDouble(0)
      val gap = best.join(lsh, col("qid") === col("vec_id"), "left_outer")
        .agg((avg(col("best_cos")) - avg(col("cos_sim"))).as("gap"))
        .head.getDouble(0)
      // IVF recall@10 over the 10-query probe set
      val queries = e.filter(col("vec_id") < 10).toDF("qid", "q_emb")
      val wTop = org.apache.spark.sql.expressions.Window
        .partitionBy("qid").orderBy(col("cos").desc, col("vec_id"))
      val exact10 = e.crossJoin(broadcast(queries))
        .filter(col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id"),
          round(graft.functions.CosineSimilarity.cosineSim(col("q_emb"), col("embedding")), 4)
            .as("cos"))
        .withColumn("rn", row_number().over(wTop))
        .filter(col("rn") <= 10)
      val ivf = SimilarityOps.annIvf.fn(spark, d)
        .select(col("qid").as("iq"), col("neighbor"))
      val recall = exact10.join(ivf,
          col("qid") === col("iq") && col("vec_id") === col("neighbor"))
        .count() / (queries.count() * 10.0)
      println(s"[annprobe] $d coverage=$cov lsh_gap=$gap ivf_recall@10=$recall")
      lsh.unpersist()
    }
    spark.stop()
  }
}
