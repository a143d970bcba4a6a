package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.SimilarityOps
import graft.functions.CosineSimilarity.cosineSim

/** Measures the IVF-PQ served dense list against brute force for the
  * q184/q189 hybrid probe (doc 1's embedding): recall@20 at several
  * nprobe settings per SF tier. Output table feeds BENCH_NOTES and the
  * q188 audit floor. */
object HybProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .appName("hyb-probe").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      for (dir <- args) {
        val e = spark.read.parquet(s"$dir/embeddings.parquet")
          .select(col("vec_id"), col("embedding"))
        val qv = e.filter(col("vec_id") === 1)
          .select("embedding").head().getSeq[Float](0).toArray
        val cs = round(cosineSim(col("embedding"), typedlit(qv)), 4)
        val exact = e.filter(col("vec_id") =!= 1)
          .select(col("vec_id"), cs.as("cos_sim"))
          .orderBy(col("cos_sim").desc, col("vec_id")).limit(20)
          .collect().map(_.getLong(0)).toSet
        val n = e.count()
        val nlist = SimilarityOps.ivfNlist(n)
        val cents = SimilarityOps.ivfCentroids(spark, e, nlist)
        val assigned = SimilarityOps.ivfAssign(e, cents)
        val books = SimilarityOps.pqTrain(spark, assigned, cents)
        val cells = SimilarityOps.pqEncode(assigned, cents, books).cache()
        cells.count()
        val queries = {
          import spark.implicits._
          Seq((1L, qv)).toDF("qid", "q_emb")
        }
        for (nprobe <- Seq(4, 8, 12, 16, 24)) {
          val t0 = System.nanoTime()
          val served = SimilarityOps.pqSearch(queries, cells, cents,
              books, e, k = 21, nprobe = nprobe,
              shortlist = math.max(4 * 21, 40))
            .filter(col("neighbor") =!= 1)
            .orderBy(col("cos_sim").desc, col("neighbor")).limit(20)
            .collect().map(_.getLong(1)).toSet
          val ms = (System.nanoTime() - t0) / 1e6
          val hit = (served & exact).size
          println(f"[hyb] $dir n=$n nlist=$nlist nprobe=$nprobe " +
            f"recall@20=${hit / 20.0}%.2f probe_ms=$ms%.0f")
        }
        cells.unpersist()
      }
    } finally spark.stop()
  }
}
