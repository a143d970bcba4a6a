package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property law for the de-skewed shard packing (CurationOps.packShards):
  * the two-level prefix-sum formulation (bucketed running sums lifted by
  * per-bucket offsets) must be NUMERICALLY IDENTICAL to the naive
  * single-window running sum on arbitrary inputs — including doc_id
  * gaps, empty languages, zero-token docs, and bucket-boundary-straddling
  * ids. The q97 oracle pins one dataset; this law pins the algebra. */
class PackShardsPropertySpec extends SparkSpec {

  private val langs = Seq("en", "de", "fr", "zh")

  private def genRows(seed: Long): Seq[(Long, String, Long)] = {
    val g = for {
      n <- Gen.choose(1, 300)
      rows <- Gen.listOfN(n, for {
        // ids with gaps and clustering across the 8192 bucket boundary
        id <- Gen.choose(0L, 40000L)
        lang <- Gen.oneOf(langs)
        tok <- Gen.frequency(5 -> Gen.choose(0L, 400L), 1 -> Gen.const(0L))
      } yield (id, lang, tok))
    } yield rows.distinctBy(_._1) // doc_id is a key
    g.pureApply(Gen.Parameters.default, Seed(seed))
  }

  test("two-level prefix sums equal the single-window running sum") {
    for (seed <- Seq(1L, 7L, 42L, 1234L, 99999L)) {
      val spark2 = spark
      import spark2.implicits._
      val docs = genRows(seed).toDF("doc_id", "lang", "tok")
      val fast = graft.operators.CurationOps.packShards(docs)
        .collect().map(r => (r.getString(0), r.getLong(1),
          r.getLong(2), r.getLong(3))).toSet
      val w = Window.partitionBy("lang").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val naive = docs.withColumn("cum", sum("tok").over(w))
        .groupBy(col("lang"),
          ((col("cum") - col("tok")) / 2000L).cast("long").as("shard"))
        .agg(count(lit(1)).as("n_docs"), sum("tok").as("sum_tokens"))
        .collect().map(r => (r.getString(0), r.getLong(1),
          r.getLong(2), r.getLong(3))).toSet
      assert(fast == naive, s"divergence at seed=$seed")
    }
  }
}
