package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.{CosineSimilarity, RollingHashFingerprint, ShingleArray}

/** Custom Catalyst expressions: codegen path vs reference semantics,
  * property-checked over ScalaCheck-generated samples (the
  * scalatest-scalacheck bridge isn't in the offline cache, so samples are
  * drawn explicitly with a fixed seed). */
class ExpressionSpec extends SparkSpec {

  private def samples[T](g: Gen[T], n: Int = 50): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  import spark.implicits._

  test("cosine_similarity matches the higher-order-function formulation") {
    val e = Tables.t(spark, sf, "embeddings").limit(200)
    val hof = aggregate(
      zip_with(col("embedding"), col("emb_b"), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x) /
      (sqrt(aggregate(transform(col("embedding"), x => x * x),
        lit(0.0), (a, x) => a + x)) *
        sqrt(aggregate(transform(col("emb_b"), x => x * x),
          lit(0.0), (a, x) => a + x)))
    val both = e.crossJoin(
        e.select(col("embedding").as("emb_b")).limit(5))
      .select(
        CosineSimilarity.cosineSim(col("embedding"), col("emb_b")).as("fast"),
        hof.as("slow"))
      .select(abs(col("fast") - col("slow")).as("d"))
      .agg(max("d")).head().getDouble(0)
    // zip_with multiplies in float32 before the double accumulate — the
    // custom expression is the more precise one; compare loosely.
    assert(both < 1e-6, s"max deviation $both")
  }

  test("cosine_similarity is 1.0 on identical vectors, registered in SQL") {
    Tables.t(spark, sf, "embeddings").limit(10)
      .createOrReplaceTempView("cs_emb")
    val r = spark.sql(
      "SELECT cosine_similarity(embedding, embedding) AS c FROM cs_emb")
      .agg(min("c"), max("c")).head()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(math.abs(r.getDouble(1) - 1.0) < 1e-12)
  }

  test("shingle expression matches the SQL transform formulation") {
    val docs = Tables.t(spark, sf, "documents").limit(100)
      .select(col("doc_id"), col("text"), split(col("text"), " ").as("ws"))
    val sqlForm = array_distinct(
      when(size(col("ws")) >= 3,
        transform(sequence(lit(0), size(col("ws")) - 3), k =>
          concat_ws(" ", slice(col("ws"), k + 1, lit(3)))))
        .otherwise(array()))
    val diff = docs.select(
      ShingleArray.shingleArray(col("text"), 3).as("fast"),
      sqlForm.as("slow"))
      .filter(col("fast") =!= col("slow")).count()
    assert(diff == 0)
  }

  test("shingles property: count equals distinct sliding windows") {
    val texts = samples(Gen.listOf(Gen.oneOf("a", "bb", "ccc")))
      .map(_.mkString(" "))
    val out = texts.toDF("t")
      .select(col("t"), ShingleArray.shingleArray(col("t"), 3).as("s"))
      .collect()
    out.foreach { r =>
      val words = r.getString(0).split(" ", -1)
      val got = r.getSeq[String](1)
      if (words.length < 3) assert(got.isEmpty)
      else assert(got.toSet == words.sliding(3).map(_.mkString(" ")).toSet)
    }
  }

  test("rolling fingerprint: equal texts agree, is substring-stable") {
    val strs = samples(Gen.alphaNumStr, 100).filter(_.length >= 24)
    assert(strs.nonEmpty)
    val fps = (strs ++ strs).toDF("t")
      .select(col("t"), RollingHashFingerprint.rollingFingerprint(col("t"), 8))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val again = strs.toDF("t")
      .select(col("t"), RollingHashFingerprint.rollingFingerprint(col("t"), 8))
      .collect()
    again.foreach(r => assert(fps(r.getString(0)) == r.getLong(1)))
    // min-window hash of a text is among the window hashes of any supertext
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val sup = s"prefix words here $base and suffix words"
    val Array(f1, f2) = Seq(base, sup).toDF("t")
      .select(RollingHashFingerprint.rollingFingerprint(col("t"), 8))
      .collect().map(_.getLong(0))
    // not necessarily equal (supertext may have a smaller window), but
    // the supertext min can never exceed the subtext min (unsigned)
    assert(java.lang.Long.compareUnsigned(f2, f1) <= 0)
  }

  test("minhash signature agg equals the k-column min formulation") {
    import org.apache.spark.sql.GraftSqlBridge
    import org.apache.spark.sql.catalyst.expressions.XxHash64
    val data = Seq((1L, 10L), (1L, 20L), (1L, 30L), (2L, 10L), (2L, 99L))
      .toDF("doc", "s")
    val k = 8
    val sig = data.groupBy("doc").agg(
      graft.functions.MinHashSignature.minhashSignature(col("s"), k).as("sig"))
    val minCols = (0 until k).map(i => min(GraftSqlBridge.column(
      new XxHash64(Seq(GraftSqlBridge.expression(col("s"))), i)))
      .as(s"h$i"))
    val mins = data.groupBy("doc").agg(minCols.head, minCols.tail: _*)
    val joined = sig.join(mins, "doc").collect()
    joined.foreach { r =>
      val arr = r.getSeq[Long](r.fieldIndex("sig"))
      (0 until k).foreach(i => assert(arr(i) == r.getAs[Long](s"h$i")))
    }
  }

  test("shingle_hash_array equals xxhash64 over shingle_array strings") {
    val docs = Tables.t(spark, sf, "documents").limit(100)
    val viaStrings = docs.select(col("doc_id"),
      explode(graft.functions.ShingleArray.shingleArray(col("text"), 3))
        .as("s"))
      .select(col("doc_id"), xxhash64(col("s")).as("h"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val direct = docs.select(col("doc_id"),
      explode(graft.functions.ShingleHashArray
        .shingleHashArray(col("text"), 3)).as("h"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(direct == viaStrings)
  }

  test("hyperplane_bucket rejects non-float arrays at analysis") {
    val planes = Array(Array(1.0, -1.0))
    val doubles = Seq(Seq(1.0, 2.0)).toDF("v") // array<double>
    val err = intercept[Exception] {
      doubles.select(graft.functions.HyperplaneBucket
        .hyperplaneBucket(col("v"), planes)).collect()
    }
    assert(err.getMessage.toLowerCase.contains("array<float>")
      || err.getMessage.contains("DATATYPE_MISMATCH"))
    // and still works on array<float>
    val floats = Seq(Seq(1.0f, 2.0f)).toDF("v")
    val b = floats.select(graft.functions.HyperplaneBucket
      .hyperplaneBucket(col("v"), planes)).head().getInt(0)
    assert(b == 0) // 1*1 + 2*(-1) = -1 < 0 → bit clear
  }

  test("len / list_contains / list_extract SQL aliases work") {
    Tables.t(spark, sf, "embeddings").limit(5)
      .createOrReplaceTempView("alias_emb")
    val r = spark.sql(
      """SELECT len(embedding) AS l,
        |list_contains(array(1,2,3), 2) AS c,
        |list_extract(array('x','y'), 1) AS e FROM alias_emb""".stripMargin)
      .head()
    assert(r.getInt(0) == 64 && r.getBoolean(1) && r.getString(2) == "x")
  }

  test("term_counts matches the explode-groupBy formulation") {
    val texts = samples(Gen.listOfN(12,
      Gen.oneOf("a", "b", "cc", "dd", "e")).map(_.mkString(" ")), 40)
      .toDF("text").withColumn("id", monotonically_increasing_id())
    val fast = texts.select(col("id"),
      explode(graft.functions.TermCounts.termCounts(col("text")))
        .as("tc"))
      .select(col("id"), col("tc.term").as("w"), col("tc.tf").as("n"))
    val slow = texts.select(col("id"),
      explode(split(col("text"), " ")).as("w"))
      .groupBy("id", "w").agg(count(lit(1)).as("n"))
    assert(fast.exceptAll(slow).count() == 0)
    assert(slow.exceptAll(fast).count() == 0)
    // empty text → one empty-string token with count 1 (split semantics)
    val e = spark.sql("SELECT term_counts('') AS tc").head()
      .getSeq[org.apache.spark.sql.Row](0)
    assert(e.map(r => r.getString(0) -> r.getLong(1)) == Seq("" -> 1L))
  }

  test("slot_range_agg: half-open bounds, empty points, prefix sums") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val probeT = ArrayType(StructType(Seq(StructField("id", LongType),
      StructField("ts", LongType))))
    val pointT = ArrayType(StructType(Seq(StructField("ts", LongType),
      StructField("v", DoubleType))))
    val schema = StructType(Seq(StructField("probes", probeT),
      StructField("points", pointT)))
    // window = 10: probe at t=20 covers [10, 20) — the point AT 10 is
    // IN (closed lower), the point AT 20 is OUT (open upper)
    val rows = java.util.Arrays.asList(
      Row(Seq(Row(1L, 20L), Row(2L, 35L), Row(3L, 5L)),
        Seq(Row(10L, 1.0), Row(15L, 2.0), Row(20L, 4.0), Row(30L, 8.0))),
      Row(Seq(Row(4L, 100L)), Seq.empty[Row]))
    val df = spark.createDataFrame(rows, schema)
    val got = df.select(explode(graft.functions.SlotRangeAgg
        .slotRangeAgg(col("probes"), col("points"), 10L)).as("r"))
      .select(col("r.id"), col("r.n"), col("r.sv"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    assert(got == Set(
      (1L, 2L, 3.0),  // [10,20): points 10,15 — 20 excluded
      (2L, 1L, 8.0),  // [25,35): point 30
      (3L, 0L, 0.0),  // [-5,5): nothing
      (4L, 0L, 0.0))) // empty slot array
  }
}
