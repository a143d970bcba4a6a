package graft.tools

import org.apache.spark.sql.functions._

/** Stage bisection for q41 (dev tool). */
object Profile41 {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[t] $label%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    val docs = spark.read.parquet(s"$d/documents.parquet")
    val shWords = docs.select(col("doc_id"), split(col("text"), " ").as("ws"))
      .select(col("doc_id"),
        array_distinct(
          when(size(col("ws")) >= 3,
            transform(sequence(lit(0), size(col("ws")) - 3), k =>
              concat_ws(" ", slice(col("ws"), k + 1, lit(3)))))
            .otherwise(array())).as("shingles"))
    val shRaw = shWords.select(col("doc_id"), explode(col("shingles")).as("s0"))
      .select(col("doc_id"), xxhash64(col("s0")).as("s"))
    time("shingle explode")(shRaw.write.mode("overwrite").format("noop").save())
    val sh = shRaw.cache()
    time("cache materialize")(sh.count())
    val sz = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    time("sizes")(sz.write.mode("overwrite").format("noop").save())
    val pairs = sh.toDF("id_a", "s").join(sh.toDF("id_b", "s"), Seq("s"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("inter"))
    time("pair join+agg")(pairs.write.mode("overwrite").format("noop").save())
    val jac = col("inter") * lit(1.0) / (col("na") + col("nb") - col("inter"))
    val out = pairs
      .join(sz.toDF("id_a", "na"), "id_a")
      .join(sz.toDF("id_b", "nb"), "id_b")
      .filter(jac >= 0.5)
      .select(col("id_a"), col("id_b"), round(jac, 3).as("jaccard"))
    time("full")(out.write.mode("overwrite").format("noop").save())
    time("full again")(out.write.mode("overwrite").format("noop").save())
    spark.stop()
  }
}
