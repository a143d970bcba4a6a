package graft

import org.apache.spark.sql.functions._

import graft.operators.BpeOps

/** Pins the BPE trainer/encoder (q178/q179): known merges on a hand
  * corpus, rank-greedy application order, conservation laws, and the
  * corpus-level queries on sf0.001. */
class BpeSpec extends SparkSpec {

  test("trainer learns the classic merges on a hand dictionary") {
    // "low" x10, "lower" x5, "newest" x8 — 'lo' ties 'ow' at 15; 'es'
    // and 'st' at 8; lexicographic tiebreak makes the order exact.
    val m = BpeOps.trainMerges(
      Seq(("low", 10L), ("lower", 5L), ("newest", 8L)), 4)
    assert(m.ranks.size == 4)
    assert(m.ranks(("l", "o")) == 0) // 15, ties ("o","w"): "l o" < "o w"
    assert(m.ranks(("lo", "w")) == 1) // 15 after 'lo' fuses
    assert(m.ranks(("e", "s")) == 2) // 8-way tie; "e s" is lexic. least
    assert(m.ranks(("e", "w")) == 3) // next 8-tie: "e w" < "es t"
  }

  test("trainer stops when no pair repeats") {
    val m = BpeOps.trainMerges(Seq(("abc", 1L), ("xyz", 1L)), 100)
    assert(m.ranks.isEmpty)
  }

  test("encode applies merges by rank, not left-to-right") {
    // ranks: (b,c)=0, (a,bc)=1 — greedy-by-rank gives [abc];
    // left-to-right would try (a,b) first and find no merge.
    val m = BpeOps.Merges(Map(("b", "c") -> 0, ("a", "bc") -> 1))
    assert(BpeOps.encode("abc", m).toSeq == Seq("abc"))
    // unknown word: untouched singletons
    assert(BpeOps.encode("zzq", m).toSeq == Seq("z", "z", "q"))
  }

  test("encode conserves characters on every trained word") {
    val dict = Seq(("window", 20L), ("windows", 7L), ("widow", 3L),
      ("shuffle", 11L), ("shuffled", 2L))
    val m = BpeOps.trainMerges(dict, 16)
    for ((w, _) <- dict) {
      val toks = BpeOps.encode(w, m)
      assert(toks.mkString == w, s"$w -> ${toks.toSeq}")
      assert(toks.length >= 1 && toks.length <= w.length)
    }
  }

  test("q178 corpus report: fertility in [1, chars/word], all sources") {
    val df = SparkEntry.queries("q178_bpe_tokenize")(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val fertility = r.getAs[Double]("fertility")
      val cpt = r.getAs[Double]("chars_per_token")
      assert(fertility >= 1.0, s"fertility $fertility < 1")
      assert(cpt >= 1.0, s"chars_per_token $cpt < 1")
    }
    // the pinned merges must actually fire: chars_per_token > 1 means
    // multi-char tokens exist, i.e. the oracle is replaying real merges
    assert(rows.exists(_.getAs[Double]("chars_per_token") > 1.0))
    val tot = df.agg(sum("n_tokens"), sum("n_words")).head
    assert(tot.getLong(0) >= tot.getLong(1))
  }

  test("fixed merge list: rank-greedy encode == sequential exhaustion " +
      "(the equivalence the q178 oracle's recursive CTE relies on)") {
    // The oracle applies each merge to fixpoint in rank order with
    // leftmost-first replacement on a space-delimited symbol string.
    // For a hierarchically well-formed list that equals rank-greedy;
    // verify on every distinct corpus word, plus adversarial shapes
    // (chained self-pairs, rank-priority conflicts).
    def sequential(word: String): Seq[String] = {
      var s = " " + word.map(_.toString).mkString(" ") + " "
      for ((a, b) <- BpeOps.FixedMergeList) {
        var prev = ""
        while (prev != s) { prev = s; s = s.replace(s" $a $b ", s" $a$b ") }
      }
      s.trim.split(" ").toSeq
    }
    // well-formedness: outputs distinct, no output equals an input
    // symbol of an earlier merge (the precondition of the equivalence)
    val outs = BpeOps.FixedMergeList.map { case (a, b) => a + b }
    assert(outs.distinct == outs)
    for (((a, b), i) <- BpeOps.FixedMergeList.zipWithIndex;
         ((x, y), j) <- BpeOps.FixedMergeList.zipWithIndex if j < i)
      assert(x != a + b && y != a + b,
        s"merge $j consumes output of later merge $i")
    val corpusWords = Tables.t(spark, sf, "documents")
      .select(org.apache.spark.sql.functions.explode(
        split(col("text"), " ")).as("w"))
      .where(length(col("w")) > 0).distinct()
      .collect().map(_.getString(0))
    val adversarial = Seq("agggg", "orderer", "queryquery", "aststast",
      "thethe", "inine", "stan", "rorro")
    for (w <- corpusWords ++ adversarial)
      assert(BpeOps.encode(w, BpeOps.FixedMerges).toSeq == sequential(w),
        s"encode/oracle divergence on '$w'")
  }

  test("q179 audit: conservation booleans are real checks and hold") {
    val df = SparkEntry.queries("q179_bpe_audit")(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      assert(r.getAs[Boolean]("tokens_conserve_chars"),
        s"char conservation failed for ${r.getAs[String]("source")}")
      assert(r.getAs[Boolean]("tokens_bounded"))
    }
    // cross-check the engine's token_char_mass against independent
    // text arithmetic (what the DuckDB oracle computes)
    val expect = Tables.t(spark, sf, "documents")
      .groupBy("source")
      .agg(sum(length(col("text")) - size(split(col("text"), " ")) + 1)
        .as("mass"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for (r <- rows)
      assert(r.getAs[Long]("token_char_mass") ==
        expect(r.getAs[String]("source")))
  }
}
