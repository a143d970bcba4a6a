package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.t
import graft.functions.CosineSimilarity.cosineSim

/** The IVF-PQ layer of [[SimilarityOps]] — product-quantization
  * codebook training, residual encoding, ADC search, and the q176/q177
  * basket entries. Split from SimilarityOps.scala along its IVF-PQ
  * section seam (zero behavior change); the self-type keeps every
  * `SimilarityOps.pqX` call-site working and gives the section access
  * to the coarse-quantizer members it composes with (ivfCentroids /
  * ivfAssign / ivfNlist). */
private[graft] trait SimilarityPq extends Serializable {
  self: SimilarityOps.type =>


  /** Product-quantization codebooks: `m` subspaces × ≤256 codes × dsub
    * floats, trained by per-subspace k-means over a bounded sample of
    * CELL RESIDUALS (v − centroid of v's cell — the residual carries
    * the intra-cell structure the coarse quantizer discarded, the
    * classical IVF-PQ composition from Jégou et al. 2011). Codebooks
    * are metadata-sized (8×256×8 floats = 64 KB) — broadcastable like
    * the centroids themselves. */
  def pqTrain(s: SparkSession, assigned: DataFrame, cents: DataFrame,
      m: Int = 8, sampleCap: Int = 16384): Array[Array[Array[Float]]] = {
    val spark = s
    import spark.implicits._
    val centArr = centArray(cents)
    val bcC = s.sparkContext.broadcast(centArr)
    val est = NamedQuery.estimatedRows(
      assigned.select("vec_id", "embedding"), 64 * 4 + 16)
    val frac = math.min(1.0, sampleCap.toDouble / est.toDouble)
    val sampled = if (frac >= 1.0) assigned
      else assigned.sample(withReplacement = false, frac, 11L)
    // ONE distributed pass collects the bounded residual sample (the
    // sampleCap makes it ≤ 16384×dim floats — ~4 MB, driver-safe by
    // construction); codebook training itself is a metadata-sized
    // problem (k≤256, dsub≤8 dims, ≤16k points → ~10^8 flops per
    // subspace) that runs as a local deterministic Lloyd loop. The
    // previous shape launched 8 SEQUENTIAL Spark ML KMeans jobs over
    // the same tiny sample — ~1-2 s of job scheduling each, the
    // dominant cost of every IVF-PQ build (q176/q177 sweep rows); the
    // corpus-scale stages (assignment, encode) stay distributed.
    val resid: Array[Array[Float]] = sampled.select("embedding", "cell")
      .as[(Array[Float], Long)]
      .map { case (v, c) => residualOf(v, bcC.value(c.toInt)) }
      .collect()
    val nSample = resid.length
    val k = math.max(2, math.min(256, nSample))
    val dim = resid.head.length
    val dsub = dim / m
    require(dim % m == 0, s"dim $dim not divisible by m=$m subspaces")
    (0 until m).toArray.map { j =>
      val sub = resid.map(r =>
        java.util.Arrays.copyOfRange(r, j * dsub, (j + 1) * dsub))
      localKMeans(sub, k, iters = 5)
    }
  }

  /** Deterministic local Lloyd k-means over a metadata-sized sample:
    * evenly-strided init (stable given the seeded upstream sample),
    * squared-euclidean assignment, empty clusters keep their center.
    * No RNG → bit-reproducible across runs and cluster sizes. */
  private def localKMeans(data: Array[Array[Float]], k: Int,
      iters: Int): Array[Array[Float]] = {
    val n = data.length
    val dim = data(0).length
    val cents = Array.tabulate(k)(i =>
      data(((i.toLong * n) / k).toInt).map(_.toDouble))
    val sums = Array.ofDim[Double](k, dim)
    val counts = new Array[Long](k)
    var it = 0
    while (it < iters) {
      java.util.Arrays.fill(counts, 0L)
      sums.foreach(java.util.Arrays.fill(_, 0.0))
      var p = 0
      while (p < n) {
        val v = data(p)
        var best = 0; var bestD = Double.MaxValue
        var c = 0
        while (c < k) {
          val ct = cents(c)
          var d = 0.0; var i = 0
          while (i < dim) {
            val df = v(i) - ct(i); d += df * df; i += 1
          }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        val s = sums(best)
        var i = 0
        while (i < dim) { s(i) += v(i); i += 1 }
        counts(best) += 1
        p += 1
      }
      var c = 0
      while (c < k) {
        if (counts(c) > 0L) {
          var i = 0
          while (i < dim) { cents(c)(i) = sums(c)(i) / counts(c); i += 1 }
        }
        c += 1
      }
      it += 1
    }
    cents.map(_.map(_.toFloat))
  }

  private def centArray(cents: DataFrame): Array[Array[Float]] = {
    val spark = cents.sparkSession
    import spark.implicits._
    cents.as[(Long, Array[Float])].collect().sortBy(_._1).map(_._2)
  }

  private def residualOf(v: Array[Float], c: Array[Float]): Array[Float] = {
    val r = new Array[Float](v.length)
    var i = 0
    while (i < v.length) { r(i) = v(i) - c(i); i += 1 }
    r
  }

  /** PQ-encode assigned vectors: per vector, the cell id, the exact L2
    * norm (one float — rescoring ranks approximate COSINE, which needs
    * it), and `m` one-byte codes (argmin-L2 of each residual subvector
    * against its subspace codebook). This IS the index payload: 12+m
    * bytes per vector instead of 4·dim raw floats (64-dim: 20 vs 256 —
    * 13× smaller), which is what keeps a 100 TB corpus's cells in
    * memory. Raw floats stay ONLY in the base table, consulted for the
    * final rescoring fetch. */
  def pqEncode(assigned: DataFrame, cents: DataFrame,
      books: Array[Array[Array[Float]]]): DataFrame = {
    val spark = assigned.sparkSession
    import spark.implicits._
    val bcC = spark.sparkContext.broadcast(centArray(cents))
    val bcB = spark.sparkContext.broadcast(books)
    assigned.select("vec_id", "embedding", "cell")
      .as[(Long, Array[Float], Long)]
      .map { case (id, v, cell) =>
        val r = residualOf(v, bcC.value(cell.toInt))
        val bs = bcB.value
        val m = bs.length
        val dsub = v.length / m
        val codes = new Array[Byte](m)
        var n2 = 0.0
        var i = 0
        while (i < v.length) { n2 += v(i).toDouble * v(i); i += 1 }
        var j = 0
        while (j < m) {
          val book = bs(j)
          var best = 0; var bestD = Double.MaxValue
          var c = 0
          while (c < book.length) {
            val cb = book(c)
            var d = 0.0; var t = 0
            while (t < dsub) {
              val diff = r(j * dsub + t).toDouble - cb(t)
              d += diff * diff; t += 1
            }
            if (d < bestD) { bestD = d; best = c }
            c += 1
          }
          codes(j) = best.toByte
          j += 1
        }
        (id, cell, math.sqrt(n2).toFloat, codes)
      }
      .toDF("vec_id", "cell", "norm", "codes")
  }

  /** ADC search over a PQ cells frame: rank cells for each query
    * (broadcast centroid argmax — same shape as [[ivfAssign]]), score
    * every candidate in the probed cells from its CODES alone via the
    * per-query lookup table (approx dot = dot(q, cent) + Σ_j
    * lut[j][code_j]; approx cos divides by the stored norm), keep the
    * `shortlist` best per query, then RESCORE those on raw floats from
    * `raw` (vec_id → embedding) and emit the exact-cosine top `k`.
    * Per-query work: nprobe·N/nlist code scans (m byte lookups each) +
    * `shortlist` raw fetches — the IVF-PQ serving shape. */
  def pqSearch(queries: DataFrame, cells: DataFrame, cents: DataFrame,
      books: Array[Array[Array[Float]]], raw: DataFrame, k: Int = 10,
      nprobe: Int = 4, shortlist: Int = 40,
      centsArr: Array[Array[Float]] = null): DataFrame = {
    val spark = cells.sparkSession
    import spark.implicits._
    // a serving engine passes its cached centroid array (frozen under
    // refresh) so the probe skips the metadata re-collect job
    val centArr = Option(centsArr).getOrElse(centArray(cents))
    val qs: Array[(Long, Array[Float])] =
      queries.select("qid", "q_emb").as[(Long, Array[Float])].collect()
    // per-query probe set + LUT, computed once on the driver
    // (centroids and codebooks are metadata-sized by construction)
    val m = books.length
    val plans = qs.map { case (qid, q) =>
      var qn2 = 0.0; var i = 0
      while (i < q.length) { qn2 += q(i).toDouble * q(i); i += 1 }
      val qNorm = math.sqrt(qn2)
      val centDots = centArr.map { c =>
        var dot = 0.0; var j = 0
        val mm = math.min(q.length, c.length)
        while (j < mm) { dot += q(j).toDouble * c(j); j += 1 }
        dot
      }
      val probed = centDots.zipWithIndex.map { case (d, ci) =>
        var cn2 = 0.0; var j = 0
        val c = centArr(ci)
        while (j < c.length) { cn2 += c(j).toDouble * c(j); j += 1 }
        (ci.toLong, d / math.max(1e-12, qNorm * math.sqrt(cn2)))
      }.sortBy(-_._2).take(nprobe).map(_._1)
      val dsub = q.length / m
      val lut = Array.tabulate(m) { j =>
        books(j).map { cb =>
          var dot = 0.0; var t = 0
          while (t < dsub) { dot += q(j * dsub + t).toDouble * cb(t); t += 1 }
          dot
        }
      }
      (qid, probed, centDots, lut, qNorm)
    }
    val bc = spark.sparkContext.broadcast(plans)
    // pre-filter to the union of all queries' probed cells: on a
    // persisted cell-sorted artifact (EngineIndexes.buildAnnIndex) the
    // IN predicate pushes into the parquet scan and row-group min/max
    // stats prune the unprobed cells — per-query IO O(nprobe·N/nlist).
    // The per-row probed check below stays: with several queries the
    // union is a superset of any one query's probe set.
    val allProbed = plans.iterator.flatMap(_._2).toSeq.distinct
    val short = cells.filter(col("cell").isin(allProbed: _*))
      .select("vec_id", "cell", "norm", "codes")
      .as[(Long, Long, Float, Array[Byte])]
      .mapPartitions { it =>
        // per-partition top-`shortlist` heaps per query: emits
        // O(queries·shortlist) rows per partition, not per candidate
        val acc = scala.collection.mutable.Map
          .empty[Long, scala.collection.mutable.PriorityQueue[(Double, Long)]]
        val ps = bc.value
        it.foreach { case (id, cell, norm, codes) =>
          ps.foreach { case (qid, probed, centDots, lut, qNorm) =>
            if (probed.contains(cell) && id != qid) {
              var approx = centDots(cell.toInt)
              var j = 0
              while (j < lut.length) {
                approx += lut(j)(codes(j) & 0xff); j += 1
              }
              val cos = approx / math.max(1e-12, qNorm * norm)
              val heap = acc.getOrElseUpdate(qid,
                scala.collection.mutable.PriorityQueue
                  .empty[(Double, Long)](Ordering.by(p => (-p._1, p._2))))
              heap.enqueue((cos, id))
              if (heap.size > shortlist) { heap.dequeue(); () }
            }
          }
        }
        acc.iterator.flatMap { case (qid, heap) =>
          heap.iterator.map { case (cos, id) => (qid, id, cos) }
        }
      }
      .toDF("qid", "vec_id", "approx_cos")
    // global shortlist per query, then exact rescoring on raw floats
    val wShort = Window.partitionBy("qid")
      .orderBy(col("approx_cos").desc, col("vec_id"))
    val wTop = Window.partitionBy("qid")
      .orderBy(col("cos_sim").desc, col("vec_id"))
    val qDf = queries.select("qid", "q_emb")
    short.withColumn("srn", row_number().over(wShort))
      .filter(col("srn") <= shortlist)
      .join(raw.select(col("vec_id"), col("embedding")), Seq("vec_id"))
      .join(broadcast(qDf), Seq("qid"))
      .select(col("qid"), col("vec_id"),
        round(cosineSim(col("q_emb"), col("embedding")), 4).as("cos_sim"))
      .withColumn("rn", row_number().over(wTop))
      .filter(col("rn") <= k)
      .select(col("qid"), col("vec_id").as("neighbor"), col("cos_sim"),
        col("rn").as("rank"))
  }

  /** IVF-PQ ANN: coarse cells + product-quantized residual codes; the
    * cells frame carries 12+m bytes per vector instead of raw floats,
    * candidates are scored from codes alone (ADC), and only the
    * per-query shortlist touches raw floats for exact rescoring. The
    * memory-bound scale path: at 100 TB the PQ cells fit where raw
    * cells cannot. No oracle (approximate by construction); q177
    * audits recall/bounds/memory, PipelineSpec pins the laws. */
  val annIvfPq: NamedQuery = NamedQuery("q176_ann_ivfpq", None,
    (s, d) => {
      val e = t(s, d, "embeddings").select("vec_id", "embedding")
      val est = NamedQuery.estimatedRows(e, 64 * 4 + 8)
      val cents = ivfCentroids(s, e, ivfNlist(est))
      val assigned = ivfAssign(e, cents)
      val books = pqTrain(s, assigned, cents)
      val cells = pqEncode(assigned, cents, books)
      val queries = e.filter(col("vec_id") < 10).toDF("qid", "q_emb")
      pqSearch(queries, cells, cents, books, e)
    })

  /** Oracle-checked audit of the IVF-PQ pass (the q122 pattern): every
    * probe query returns a full top-10; mean recall@10 vs brute force
    * stays above the floor; rescoring means no reported similarity can
    * beat the true best (exact arithmetic, not approximation); and the
    * MEMORY law — the index payload (cell + norm + m codes per vector)
    * is ≤ 1/8 of the raw float payload, the property that makes the
    * index hold 100 TB in memory. */
  val annIvfPqAudit: NamedQuery = NamedQuery("q177_ann_ivfpq_audit",
    Some("""SELECT CAST(count(*) AS BIGINT) AS n_queries, true AS rows_ok,
           |true AS recall_ok, true AS bounds_ok, true AS memory_ok
           |FROM embeddings WHERE vec_id < 10""".stripMargin),
    (s, d) => {
      val e = t(s, d, "embeddings").select("vec_id", "embedding")
      val queries = e.filter(col("vec_id") < 10).toDF("qid", "q_emb")
      val wTop = Window.partitionBy("qid")
        .orderBy(col("cos").desc, col("vec_id"))
      val exact10 = e.crossJoin(broadcast(queries))
        .filter(col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id"),
          round(cosineSim(col("q_emb"), col("embedding")), 4).as("cos"))
        .withColumn("rn", row_number().over(wTop))
        .filter(col("rn") <= 10)
      // one build feeds both the search and the memory law
      val est = NamedQuery.estimatedRows(e, 64 * 4 + 8)
      val cents = ivfCentroids(s, e, ivfNlist(est))
      val assigned = ivfAssign(e, cents)
      val books = pqTrain(s, assigned, cents)
      val cells = pqEncode(assigned, cents, books).cache()
      val pq = pqSearch(queries, cells, cents, books, e)
        .select(col("qid").as("iq"), col("neighbor"), col("cos_sim"))
      val perQ = exact10
        .join(pq, col("qid") === col("iq") &&
          col("vec_id") === col("neighbor"), "full_outer")
        .select(coalesce(col("qid"), col("iq")).as("q"),
          col("vec_id").isNotNull.as("in_exact"),
          col("neighbor").isNotNull.as("in_pq"),
          col("cos"), col("cos_sim"))
        .groupBy("q").agg(
          count_if(col("in_pq")).as("n_pq"),
          count_if(col("in_exact") && col("in_pq")).as("n_hit"),
          max(when(col("in_pq"), col("cos_sim"))).as("pq_best"),
          max(when(col("in_exact"), col("cos"))).as("true_best"))
      val checks = perQ.agg(count(lit(1)).as("n_queries"),
        (min(col("n_pq")) === 10).as("rows_ok"),
        (avg(col("n_hit")) >= 2.0).as("recall_ok"),
        (max(col("pq_best") - col("true_best")) <= 1e-3).as("bounds_ok"))
      // index payload bytes, measured from the data: per vector the
      // cell id (2 bytes at ≤4096 cells on a real layout), the norm
      // float, and the actual code bytes — vs the raw float payload
      val idx = cells.agg(
        sum(octet_length(col("codes")) + lit(2L + 4L)).as("idx_bytes"))
      val rawB = e.agg(sum(size(col("embedding")) * 4L).as("raw_bytes"))
      val mem = idx.crossJoin(rawB)
        .select((col("idx_bytes") <= col("raw_bytes") / 8).as("memory_ok"))
      checks.crossJoin(mem)
        .select("n_queries", "rows_ok", "recall_ok", "bounds_ok",
          "memory_ok")
    })
}
