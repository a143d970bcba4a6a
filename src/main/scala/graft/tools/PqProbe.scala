package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** One-shot measurement of the IVF-PQ pass at a tier: recall@10 vs
  * brute force, bounds, memory ratio, wall — sets q177's floor
  * empirically (the AnnFloorProbe pattern). */
object PqProbe {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.SimilarityOps._
    import graft.functions.CosineSimilarity.cosineSim
    val e = graft.Tables.t(spark, d, "embeddings").select("vec_id", "embedding")
    val queries = e.filter(col("vec_id") < 10).toDF("qid", "q_emb")
    val wTop = Window.partitionBy("qid").orderBy(col("cos").desc, col("vec_id"))
    val exact10 = e.crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        round(cosineSim(col("q_emb"), col("embedding")), 4).as("cos"))
      .withColumn("rn", row_number().over(wTop)).filter(col("rn") <= 10)
      .cache()
    val est = graft.operators.NamedQuery.estimatedRows(e, 64 * 4 + 8)
    val t0 = System.nanoTime()
    val cents = ivfCentroids(spark, e, ivfNlist(est))
    val assigned = ivfAssign(e, cents)
    val books = pqTrain(spark, assigned, cents)
    val cells = pqEncode(assigned, cents, books).cache()
    cells.count()
    val tBuild = (System.nanoTime() - t0) / 1e9
    val t1 = System.nanoTime()
    val pq = pqSearch(queries, cells, cents, books, e)
      .select(col("qid").as("iq"), col("neighbor"), col("cos_sim")).cache()
    pq.count()
    val tSearch = (System.nanoTime() - t1) / 1e9
    val perQ = exact10.join(pq, col("qid") === col("iq") &&
        col("vec_id") === col("neighbor"), "full_outer")
      .select(coalesce(col("qid"), col("iq")).as("q"),
        col("vec_id").isNotNull.as("in_exact"),
        col("neighbor").isNotNull.as("in_pq"), col("cos"), col("cos_sim"))
      .groupBy("q").agg(
        count_if(col("in_pq")).as("n_pq"),
        count_if(col("in_exact") && col("in_pq")).as("n_hit"),
        max(when(col("in_pq"), col("cos_sim"))).as("pq_best"),
        max(when(col("in_exact"), col("cos"))).as("true_best"))
    val agg = perQ.agg(avg("n_hit").as("avg_hit"), min("n_pq").as("min_rows"),
      max(col("pq_best") - col("true_best")).as("max_excess")).head()
    val idx = cells.agg(sum(octet_length(col("codes")) + lit(6L))).head().getLong(0)
    val raw = e.agg(sum(size(col("embedding")) * 4L)).head().getLong(0)
    println(s"[pqprobe] $d n=$est build=${tBuild}s search=${tSearch}s " +
      s"avg_hit=${agg.getDouble(0)} min_rows=${agg.getLong(1)} " +
      s"max_excess=${agg.getDouble(2)} idx_bytes=$idx raw_bytes=$raw " +
      s"ratio=${idx.toDouble / raw}")
    spark.stop()
  }
}
