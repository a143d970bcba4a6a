package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{NamedQuery, SimilarityOps}

/** IVF cell-occupancy A/B: evenly-strided init (r18) vs deterministic
  * k-means++ (r19) on the same sorted sample — the r18 q189 regression
  * hypothesis is that strided seeding under-separates centers and the
  * probe scans fat cells. Reports per-init occupancy spread (max,
  * median, p90, stddev) and the mean rows a q189-shaped probe scans
  * (sum of the nprobe nearest cells' sizes over 16 deterministic
  * sample queries). Usage: runMain graft.tools.Q189Probe [sfDir] */
object Q189Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val e = graft.Tables.t(spark, sfDir, "embeddings")
      .select("vec_id", "embedding")
    val est = NamedQuery.estimatedRows(e, 64 * 4 + 8)
    val nlist = SimilarityOps.ivfNlist(est)
    val normedWithId = e.as[(Long, Array[Float])].map { case (id, v) =>
      var n2 = 0.0; var i = 0
      while (i < v.length) { n2 += v(i).toDouble * v(i); i += 1 }
      val nm = math.sqrt(n2)
      (id, v.map(x => if (nm == 0.0) 0.0 else x / nm))
    }.collect().sortBy(_._1)
    val normed = normedWithId.map(_._2)
    val k = math.min(nlist, normed.length)
    println(s"[q189] n=${normed.length} nlist=$nlist k=$k")
    def stats(tag: String, strided: Boolean): Unit = {
      val t0 = System.nanoTime()
      val cents = SimilarityOps.parallelKMeans(normed, k, iters = 5,
        stridedInit = strided)
      val trainS = (System.nanoTime() - t0) / 1e9
      val cdf = cents.zipWithIndex
        .map { case (c, i) => (i.toLong, c.map(_.toFloat)) }
        .toSeq.toDF("cid", "cent")
      val occ = SimilarityOps.ivfAssign(e, cdf)
        .groupBy("cell").agg(count(lit(1)).as("c"))
        .select("c").as[Long].collect().sorted
      val nCells = occ.length
      val med = occ(nCells / 2)
      val p90 = occ((nCells * 9) / 10)
      val mx = occ.last
      val mean = occ.sum.toDouble / nCells
      val sd = math.sqrt(occ.map(c => (c - mean) * (c - mean)).sum / nCells)
      // q189-shaped probe cost: nprobe nearest cells by centroid cosine
      // for 16 deterministic queries
      val nprobe = math.max(8, (k + 2) / 3)
      val centArr = cents
      val sizes = SimilarityOps.ivfAssign(e, cdf)
        .groupBy("cell").agg(count(lit(1)).as("c"))
        .as[(Long, Long)].collect().toMap
      val queries = normedWithId.take(16).map(_._2)
      val scanned = queries.map { q =>
        val byCos = centArr.zipWithIndex.map { case (c, ci) =>
          var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
          while (i < c.length) {
            dot += c(i) * q(i); na += c(i) * c(i); nb += q(i) * q(i); i += 1
          }
          (ci.toLong, dot / math.max(1e-12, math.sqrt(na) * math.sqrt(nb)))
        }.sortBy(-_._2).take(nprobe).map(_._1)
        byCos.map(c => sizes.getOrElse(c, 0L)).sum
      }
      val meanScan = scanned.sum.toDouble / scanned.length
      println(f"[q189] $tag%-9s train=$trainS%.2fs cells=$nCells " +
        f"occ(med=$med p90=$p90 max=$mx sd=$sd%.1f) " +
        f"probeScan(mean=$meanScan%.0f of ${occ.sum})")
    }
    stats("strided", strided = true)
    stats("kmeans++", strided = false)
    spark.stop()
  }
}
