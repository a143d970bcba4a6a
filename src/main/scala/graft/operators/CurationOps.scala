package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.t

/** Training-data curation operators — the steps between dedup and the
  * tokenizer in a large-scale pipeline: stratified downsampling to a
  * target language/source mix, packing documents into token-budgeted
  * shards, and vocabulary building. All three are deterministic (mod-
  * sampling rather than RNG, stable orderings) so runs are reproducible
  * and every one hash-checks against a DuckDB oracle.
  */
object CurationOps {

  /** Stratified sampling to a per-language rate via deterministic
    * mod-sampling (`doc_id % 97 < pct`): reproducible across runs and
    * engines — the property RNG sampling lacks — and purely map-side at
    * scale (filter + partial-agg; the rate table broadcasts). */
  val stratifiedSample: NamedQuery = NamedQuery("q96_stratified_sample",
    Some("""WITH rates AS (SELECT * FROM (VALUES
           |  ('en', 10), ('de', 50), ('fr', 50), ('es', 80), ('zh', 100))
           |  r(lang, pct))
           |SELECT d.lang, count(*) AS n_total,
           |CAST(sum(CASE WHEN doc_id % 97 < pct THEN 1 ELSE 0 END)
           |  AS BIGINT) AS n_kept
           |FROM documents d JOIN rates USING (lang)
           |GROUP BY d.lang ORDER BY d.lang""".stripMargin),
    (s, d) => {
      val spark = s
      import spark.implicits._
      val rates = Seq(("en", 10), ("de", 50), ("fr", 50), ("es", 80),
        ("zh", 100)).toDF("lang", "pct")
      t(s, d, "documents").join(broadcast(rates), Seq("lang"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_total"),
          sum(when(col("doc_id") % 97 < col("pct"), 1).otherwise(0))
            .as("n_kept"))
        .orderBy("lang")
    })

  /** Token-budget shard packing: within each language, documents are
    * packed in doc_id order into shards of ≤ 2k whitespace tokens by a
    * running-sum window — the streaming shard assignment a training-data
    * writer uses. Partitioning by language keeps the window parallel
    * (one global ordering would serialize at 100 TB; per-stratum
    * packing is also what a curriculum mixer wants). */
  val shardPacking: NamedQuery = NamedQuery("q97_shard_packing",
    Some("""WITH t AS (SELECT doc_id, lang,
           |  len(string_split(text, ' ')) AS tok FROM documents),
           |c AS (SELECT lang, doc_id, tok,
           |  sum(tok) OVER (PARTITION BY lang ORDER BY doc_id
           |    ROWS UNBOUNDED PRECEDING) AS cum FROM t)
           |SELECT lang, CAST((cum - tok) // 2000 AS BIGINT) AS shard,
           |  count(*) AS n_docs, CAST(sum(tok) AS BIGINT) AS sum_tokens
           |FROM c GROUP BY 1, 2 ORDER BY lang, shard""".stripMargin),
    (s, d) => {
      val w = Window.partitionBy("lang").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, d, "documents")
        .select(col("doc_id"), col("lang"),
          size(split(col("text"), " ")).cast("long").as("tok"))
        .withColumn("cum", sum("tok").over(w))
        .groupBy(col("lang"),
          ((col("cum") - col("tok")) / 2000L).cast("long").as("shard"))
        .agg(count(lit(1)).as("n_docs"), sum("tok").as("sum_tokens"))
        .orderBy("lang", "shard")
    })

  /** Vocabulary building: top-10 tokens per language by frequency (the
    * seed statistics a tokenizer trainer consumes). Explode → two-level
    * aggregation (partial combine on (lang, token)) → per-language
    * top-k via WindowGroupLimit — no global sort. */
  val vocabTopK: NamedQuery = NamedQuery("q98_vocab_topk",
    Some("""WITH tok AS (SELECT lang, unnest(string_split(text, ' ')) AS w
           |  FROM documents),
           |cnt AS (SELECT lang, w, count(*) AS n FROM tok GROUP BY 1, 2),
           |rk AS (SELECT lang, w, n,
           |  row_number() OVER (PARTITION BY lang ORDER BY n DESC, w) AS rk
           |  FROM cnt)
           |SELECT lang, w, n, CAST(rk AS BIGINT) AS rk
           |FROM rk WHERE rk <= 10 ORDER BY lang, rk""".stripMargin),
    (s, d) => {
      val w = Window.partitionBy("lang").orderBy(col("n").desc, col("w"))
      t(s, d, "documents")
        .select(col("lang"), explode(split(col("text"), " ")).as("w"))
        .groupBy("lang", "w").agg(count(lit(1)).as("n"))
        .withColumn("rk", row_number().over(w).cast("long"))
        .filter(col("rk") <= 10)
        .orderBy("lang", "rk")
    })

  def defs: Seq[NamedQuery] = Seq(stratifiedSample, shardPacking, vocabTopK)
}
