package graft.tools

import org.apache.spark.sql.functions._

/** Stage bisection for q42 minhash-LSH at scale (dev tool). */
object Profile42 {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/scale10")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[t] $label%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    val docs = spark.read.parquet(s"$d/documents.parquet")
    val sh = docs.select(col("doc_id"),
        graft.functions.ShingleArray.shingleArray(col("text"), 3).as("shingles"))
      .select(col("doc_id"), explode(col("shingles")).as("s0"))
      .select(col("doc_id"), xxhash64(col("s0")).as("s"))
      .cache()
    time("shingles+cache")(sh.count())
    val sig = sh.groupBy("doc_id").agg(
      graft.functions.MinHashSignature.minhashSignature(col("s"), 32).as("sig"))
      .cache()
    time("signatures")(sig.count())
    val bandCols = (0 until 8).map { b =>
      struct(lit(b).as("band"), xxhash64(slice(col("sig"), b * 4 + 1, 4)).as("bh"))
    }
    val buckets = sig.select(col("doc_id"), explode(array(bandCols: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.bh").as("bh"))
      .cache()
    time("buckets")(buckets.count())
    val cand = buckets.toDF("id_a", "band", "bh")
      .join(buckets.toDF("id_b", "band", "bh"), Seq("band", "bh"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
      .cache()
    println("[t] n_cand = " + time("cand pairs")(cand.count()))
    val candDocs = cand.select(col("id_a").as("doc_id"))
      .union(cand.select(col("id_b").as("doc_id"))).distinct()
    val shCand = sh.join(broadcast(candDocs), Seq("doc_id"), "left_semi")
      .select("doc_id", "s")
    val sz = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val inter = shCand.toDF("id_a", "s").join(shCand.toDF("id_b", "s"), Seq("s"))
      .filter(col("id_a") < col("id_b"))
      .join(cand, Seq("id_a", "id_b"), "left_semi")
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("inter"))
    time("verify")(inter.write.mode("overwrite").format("noop").save())
    spark.stop()
  }
}
