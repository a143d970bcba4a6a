package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Tables.t
import graft.functions.RollingHashFingerprint.rollingFingerprint

/** Text-analysis operators over the `documents` table: token counting,
  * quality scoring, language-ID heuristics, fingerprinting. All are
  * narrow per-row transforms (no shuffle) — at 100 TB they pipeline
  * inside the scan stage. */
object TextOps extends TextRetrieval {

  private val stopwords = Seq("the", "a", "data", "big")
  private val stopwordSql = stopwords.map(w => s"'$w'").mkString(", ")

  /** Whitespace token counting + chars-per-token. */
  val tokens: NamedQuery = NamedQuery("q47_text_tokens",
    Some("""SELECT doc_id, len(string_split(text, ' ')) AS n_tokens,
           |round(len(text) * 1.0 / len(string_split(text, ' ')), 3)
           |  AS chars_per_token
           |FROM documents""".stripMargin),
    (s, d) => {
      val n = graft.functions.TokenCount.tokenCount(col("text"))
      t(s, d, "documents").select(
        col("doc_id"),
        n.cast("bigint").as("n_tokens"),
        round(length(col("text")) * lit(1.0) / n, 3).as("chars_per_token"))
    })

  /** Quality scoring: stopword ratio and a [0,1] score combining length
    * saturation with non-stopword density. Token lengths are derived
    * arithmetically (chars − separators) so both engines compute the
    * identical formula. */
  val quality: NamedQuery = NamedQuery("q48_text_quality",
    Some(s"""SELECT doc_id,
            |  round(len(list_filter(string_split(text, ' '),
            |        w -> w IN ($stopwordSql))) * 1.0
            |        / len(string_split(text, ' ')), 3) AS stop_ratio,
            |  round((len(text) - len(string_split(text, ' ')) + 1) * 1.0
            |        / len(string_split(text, ' ')), 3) AS avg_word_len,
            |  round(least(len(string_split(text, ' ')) / 50.0, 1.0)
            |        * (1.0 - len(list_filter(string_split(text, ' '),
            |              w -> w IN ($stopwordSql))) * 1.0
            |           / len(string_split(text, ' '))), 3) AS quality_score
            |FROM documents""".stripMargin),
    (s, d) => {
      val ws = split(col("text"), " ")
      val n = size(ws).cast("double")
      val nStop = size(filter(ws, w => w.isin(stopwords: _*))).cast("double")
      val stopRatio = nStop / n
      t(s, d, "documents").select(
        col("doc_id"),
        round(stopRatio, 3).as("stop_ratio"),
        round((length(col("text")) - size(ws) + 1) * lit(1.0) / n, 3)
          .as("avg_word_len"),
        round(least(n / 50.0, lit(1.0)) * (lit(1.0) - stopRatio), 3)
          .as("quality_score"))
    })

  /** Language-ID by function-word n-gram presence — the classic cheap
    * heuristic (language-characteristic function words as features). The
    * synthetic corpus shares one vocabulary, so this mostly labels 'en';
    * the point is the deterministic, oracle-checkable classifier shape. */
  val langId: NamedQuery = NamedQuery("q49_text_langid",
    Some("""SELECT doc_id, lang,
           |CASE WHEN contains(text, ' der ') OR contains(text, ' und ') THEN 'de'
           |     WHEN contains(text, ' le ') OR contains(text, ' et ') THEN 'fr'
           |     WHEN contains(text, ' el ') OR contains(text, ' y ') THEN 'es'
           |     ELSE 'en' END AS pred_lang
           |FROM documents""".stripMargin),
    (s, d) => t(s, d, "documents").select(
      col("doc_id"), col("lang"),
      when(col("text").contains(" der ") || col("text").contains(" und "), "de")
        .when(col("text").contains(" le ") || col("text").contains(" et "), "fr")
        .when(col("text").contains(" el ") || col("text").contains(" y "), "es")
        .otherwise("en").as("pred_lang")))

  /** Content-hash fingerprint (md5 — identical across engines). */
  val fingerprint: NamedQuery = NamedQuery("q50_text_fingerprint",
    Some("SELECT doc_id, md5(text) AS fp FROM documents"),
    (s, d) => t(s, d, "documents").select(
      col("doc_id"), md5(col("text")).as("fp")))

  /** Winnowing-style rolling-hash fingerprint via the custom codegen'd
    * [[graft.functions.RollingHashFingerprint]] expression. Equal
    * fingerprints flag shared-substring candidates. The hash values are
    * engine-defined, so the oracle row asserts the property that makes
    * the operator usable as a dedup key: identical texts MUST produce
    * identical fingerprints wherever they are computed (`fp_consistent`
    * hashes to true per exact-duplicate group — a nondeterministic or
    * partition-dependent fingerprint flips the row red). Raw values are
    * covered by ExpressionSpec. */
  val rollingFp: NamedQuery = NamedQuery("q51_rolling_fingerprint",
    Some("""SELECT md5(text) AS text_md5, CAST(count(*) AS BIGINT) AS n_docs,
           |min(doc_id) AS first_doc, true AS fp_consistent
           |FROM documents GROUP BY md5(text)""".stripMargin),
    (s, d) => {
      val docs = t(s, d, "documents")
        .select(col("doc_id"), md5(col("text")).as("text_md5"),
          rollingFingerprint(col("text"), 16).as("fp"))
      docs.groupBy("text_md5").agg(count(lit(1)).as("n_docs"),
        min("doc_id").as("first_doc"),
        (count_distinct(col("fp")) === 1).as("fp_consistent"))
    })

  /** Regex ("BPE-ish") tokenization: letter runs / digit runs as separate
    * tokens, vowel counting — the lexer-level statistics a tokenizer
    * pipeline samples before training. Same regex dialect both engines. */
  val bpeTokens: NamedQuery = NamedQuery("q65_text_bpe_tokens",
    Some("""SELECT doc_id,
           |len(regexp_extract_all(text, '[a-z]+|[0-9]+')) AS n_bpe_tokens,
           |len(regexp_extract_all(text, '[aeiou]')) AS n_vowels,
           |len(regexp_extract_all(text, '[a-z]{6,}')) AS n_long_words
           |FROM documents""".stripMargin),
    (s, d) => t(s, d, "documents").select(
      col("doc_id"),
      size(regexp_extract_all(col("text"), lit("[a-z]+|[0-9]+"), lit(0)))
        .cast("bigint").as("n_bpe_tokens"),
      size(regexp_extract_all(col("text"), lit("[aeiou]"), lit(0)))
        .cast("bigint").as("n_vowels"),
      size(regexp_extract_all(col("text"), lit("[a-z]{6,}"), lit(0)))
        .cast("bigint").as("n_long_words")))

  /** PII redaction: emails and fixed-shape phone numbers replaced with
    * placeholder tokens — the scrub step before training text ships.
    * The corpus has no real PII, so deterministic synthetic PII is
    * appended per doc (same construction in both engines) and the
    * redaction is verified by match counts + an md5 of the scrubbed
    * text. Patterns chosen to behave identically under Java regex and
    * RE2. */
  val piiScrub: NamedQuery = {
    val emailRe = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
    val phoneRe = "\\+1-555-[0-9]{3}-[0-9]{4}"
    NamedQuery("q110_pii_scrub",
      Some(s"""WITH inj AS (SELECT doc_id,
             |  text || ' user' || CAST(doc_id AS VARCHAR)
             |    || '@example.com +1-555-000-'
             |    || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS t
             |  FROM documents)
             |SELECT doc_id,
             |CAST(len(regexp_extract_all(t, '$emailRe')) AS BIGINT)
             |  AS n_emails,
             |CAST(len(regexp_extract_all(t, '$phoneRe')) AS BIGINT)
             |  AS n_phones,
             |md5(regexp_replace(regexp_replace(t, '$emailRe', '<EMAIL>', 'g'),
             |  '$phoneRe', '<PHONE>', 'g')) AS scrub_md5
             |FROM inj ORDER BY doc_id""".stripMargin),
      (s, d) => {
        val injected = concat(col("text"), lit(" user"),
          col("doc_id").cast("string"), lit("@example.com +1-555-000-"),
          lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0"))
        t(s, d, "documents")
          .select(col("doc_id"), injected.as("t"))
          .select(col("doc_id"),
            size(regexp_extract_all(col("t"), lit(emailRe), lit(0)))
              .cast("bigint").as("n_emails"),
            size(regexp_extract_all(col("t"), lit(phoneRe), lit(0)))
              .cast("bigint").as("n_phones"),
            md5(regexp_replace(
              regexp_replace(col("t"), emailRe, "<EMAIL>"),
              phoneRe, "<PHONE>").cast("binary")).as("scrub_md5"))
          .orderBy("doc_id")
      })
  }

  /** Canonical text normalization — lowercase, strip non-alphanumerics,
    * collapse runs of whitespace, trim: the cleaning pass upstream of
    * dedup/tokenization, verified by md5 + lengths. */
  val normalize: NamedQuery = NamedQuery("q111_text_normalize",
    Some("""SELECT doc_id,
           |md5(trim(regexp_replace(
           |  lower(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')),
           |  ' +', ' ', 'g'))) AS norm_md5,
           |CAST(length(trim(regexp_replace(
           |  lower(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')),
           |  ' +', ' ', 'g'))) AS BIGINT) AS norm_len
           |FROM documents ORDER BY doc_id""".stripMargin),
    (s, d) => {
      val norm = trim(regexp_replace(
        lower(regexp_replace(col("text"), "[^a-zA-Z0-9 ]", "")),
        " +", " "))
      // no ORDER BY: the comparator canonicalizes row order, and a
      // global sort is a corpus-wide range exchange this narrow
      // in-scan transform otherwise never pays (sf1: 5.2 → ~1 s)
      t(s, d, "documents").select(col("doc_id"),
        md5(norm.cast("binary")).as("norm_md5"),
        length(norm).cast("bigint").as("norm_len"))
    })

  /** Repetition detection via compression ratio (the Gopher/RefinedWeb
    * quality rule: highly repetitive text compresses far below natural
    * prose). Deflate runs partition-wise over the UTF-8 bytes with one
    * reused Deflater per partition — a narrow per-row transform inside
    * the scan stage, no shuffle. */
  private[graft] def compressionStats(docs: org.apache.spark.sql.Dataset[
      (Long, String)]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.mapPartitions { it =>
      val deflater = new java.util.zip.Deflater(6)
      val buf = new Array[Byte](1 << 16)
      it.map { case (id, text) =>
        val bytes = text.getBytes("UTF-8")
        deflater.reset()
        deflater.setInput(bytes)
        deflater.finish()
        var compressed = 0L
        while (!deflater.finished())
          compressed += deflater.deflate(buf)
        val ratio =
          if (bytes.isEmpty) 1.0
          else compressed.toDouble / bytes.length
        (id, bytes.length.toLong, compressed,
          math.rint(ratio * 1000) / 1000,
          ratio < 0.3) // repetitive if it compresses below 30%
      }
    }.toDF("doc_id", "n_bytes", "n_compressed", "compression_ratio",
      "is_repetitive")
  }

  /** The query surface: deflate sizes are engine-defined (no cross-engine
    * deflate oracle), so the oracle row carries the exact byte counts
    * plus a compression-sanity audit — deflate must produce output, and
    * never exceed the stored-block bound (input + small header overhead).
    * The repetitive-text-compresses-better invariant is pinned by
    * PipelineSpec on planted text; raw ratios via `compressionStats`. */
  val repetition: NamedQuery = NamedQuery("q118_repetition",
    Some("""SELECT doc_id,
           |CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
           |true AS ratio_ok FROM documents""".stripMargin),
    (s, d) => {
      val spark = s
      import spark.implicits._
      compressionStats(t(s, d, "documents").select("doc_id", "text")
        .as[(Long, String)])
        .select(col("doc_id"), col("n_bytes"),
          (col("n_compressed") > 0 &&
            col("n_compressed") <= col("n_bytes") + 64).as("ratio_ok"))
    })

  /** One-pass heavy-hitters over the token stream via the Misra–Gries
    * sketch ([[graft.functions.MisraGries]], k = 16 counters < the
    * corpus vocabulary, so the decrement/merge paths genuinely run),
    * oracle-audited on its invariants: every token with true frequency
    * above N/(k+1) must be among the candidates (`guarantee_ok`), every
    * candidate's exact count must sit inside its [lo, hi] certificate
    * (`bounds_ok` — MG never overcounts; the carried decrement total
    * bounds the undercount), and the state never exceeds k counters
    * (`size_ok`). The candidate SET itself is execution-order-dependent
    * (true of any MG run), so the oracle asserts the properties; the
    * exact token/heavy counts hash-match outright. */
  val heavyHitters: NamedQuery = NamedQuery("q131_heavy_hitters_audit",
    Some("""WITH t AS (SELECT unnest(string_split(text, ' ')) AS tok
           |  FROM documents),
           |e AS (SELECT tok, count(*) AS c FROM t GROUP BY tok),
           |n AS (SELECT CAST(count(*) AS BIGINT) AS n_tokens FROM t)
           |SELECT n_tokens,
           |  CAST((SELECT count(*) FROM e
           |        WHERE c > n_tokens / 17.0) AS BIGINT) AS n_heavy,
           |  true AS guarantee_ok, true AS bounds_ok, true AS size_ok
           |FROM n""".stripMargin),
    (s, d) => {
      val k = 16
      val toks = t(s, d, "documents")
        .select(explode(split(col("text"), " ")).as("tok")).cache()
      val exact = toks.groupBy("tok").agg(count(lit(1)).as("c"))
      val cand = toks
        .agg(graft.functions.MisraGries.misraGries(col("tok"), k).as("mg"),
          count(lit(1)).as("n_tokens"))
        .select(col("n_tokens"), explode(col("mg")).as("e"))
        .select(col("n_tokens"), col("e.token").as("tok"),
          col("e.lo"), col("e.hi"))
      // bounds: every candidate's exact count within [lo, hi]; ≤ k rows
      val boundsSide = cand.join(exact, Seq("tok"), "left_outer").agg(
        first("n_tokens").as("n_tokens"),
        count_if(col("c").isNull || col("c") < col("lo") ||
          col("c") > col("hi")).as("bad_bounds"),
        count(lit(1)).as("n_cand"))
      // guarantee: no token above the N/(k+1) line missing from candidates
      val heavySide = exact
        .join(boundsSide.select("n_tokens"))
        .filter(col("c") > col("n_tokens") / (k + 1).toDouble)
        .join(cand.select("tok"), Seq("tok"), "left_anti")
        .agg(count(lit(1)).as("n_missing"))
      val nHeavy = exact.join(boundsSide.select("n_tokens"))
        .filter(col("c") > col("n_tokens") / (k + 1).toDouble)
        .agg(count(lit(1)).as("n_heavy"))
      boundsSide.join(heavySide).join(nHeavy).select(
        col("n_tokens"), col("n_heavy"),
        (col("n_missing") === 0L).as("guarantee_ok"),
        (col("bad_bounds") === 0L).as("bounds_ok"),
        (col("n_cand") <= k.toLong).as("size_ok"))
    })

  /** TF-IDF top-3 terms per document — the classic salience scoring a
    * curation pipeline uses for keyword extraction / topic tagging:
    * tf(term, doc) × ln(N / df(term)), ranked per doc with rounded-score
    * tie-break on the term so both engines order identically.
    *
    * Scale shape: explode → combiner-friendly (doc, term) count → df by
    * a second partial-agg → equi-join on term (stopwords are corpus-hot
    * keys: the join is AQE skew-splittable, and their idf ≈ 0 drops
    * them from every top-3 anyway) → per-doc top-k via the row_number
    * WindowGroupLimit (partition key is doc_id — corpus-cardinality, no
    * skew). N rides along as a 1-row broadcast. */
  val tfidf: NamedQuery = NamedQuery("q138_tfidf",
    Some("""WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
           |  FROM documents),
           |tf AS (SELECT doc_id, term, count(*) AS tf FROM w GROUP BY 1, 2),
           |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
           |n AS (SELECT count(*) AS nn FROM documents),
           |sc AS (SELECT doc_id, term, tf,
           |  round(tf * ln(nn * 1.0 / df), 4) AS score FROM tf
           |  JOIN df USING (term), n),
           |rk AS (SELECT doc_id, term, tf, score, row_number()
           |  OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rk
           |  FROM sc)
           |SELECT doc_id, term, CAST(tf AS BIGINT) AS tf, score,
           |  CAST(rk AS BIGINT) AS rk
           |FROM rk WHERE rk <= 3""".stripMargin),
    (s, d) => {
      val docs = t(s, d, "documents")
      // per-doc term counts computed IN-ROW (codegen'd TermCounts): all
      // tokens of a doc live in one input row, so tf needs no shuffle —
      // the explode → groupBy(doc_id, term) formulation exchanged one
      // row per (doc, term) across the cluster, the largest stage of
      // this query at sf1 (see TermCounts scaladoc)
      val tf = docs
        .select(col("doc_id"),
          explode(graft.functions.TermCounts.termCounts(col("text")))
            .as("tc"))
        .select(col("doc_id"), col("tc.term").as("term"),
          col("tc.tf").as("tf"))
      // df aggregates map-side to vocab-sized partials before its one
      // small shuffle; tf is cheap enough (scan + in-row counts) that
      // recomputing it here beats caching a 5M-row frame
      val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
      val n = docs.agg(count(lit(1)).as("nn"))
      // top-3 via aggregation, not a window: a row_number window plans
      // sort + partial/final WindowGroupLimit over the full (doc, term)
      // frame — two 5M-row sorts at sf1. The agg buffers one doc's terms
      // (bounded by doc length), sorts ~150 elements in-memory, and
      // slices — no frame-wide sort, one exchange on doc_id.
      // shuffle-hash, not sort-merge: the idf join keys on the raw term
      // STRING, and SMJ pays two frame-wide string sorts for it —
      // standalone sf100 A/B: 67-69 s SMJ vs 59 s SHJ (~13%);
      // 512-partition variants unchanged either way, so the residual
      // decade-tier superlinearity is not spill or join strategy but
      // the tier's vocabulary itself (MakeBenchTier's per-copy mutation
      // prefixes grow vocab ~linearly with copies, where a real corpus
      // follows Heaps' law — BENCH_NOTES r11). The hash build is the
      // df side — vocab-sized per partition, the smaller side by the
      // tf multiplicity.
      tf.join(df.hint("shuffle_hash"), Seq("term")).crossJoin(broadcast(n))
        .withColumn("score",
          round(col("tf") * log(col("nn") * 1.0 / col("df")), 4))
        .groupBy("doc_id").agg(
          slice(array_sort(collect_list(struct(
            (-col("score")).as("ns"), col("term"), col("tf"),
            col("score")))), 1, 3).as("top"))
        .select(col("doc_id"), posexplode(col("top")).as(Seq("i", "kv")))
        .select(col("doc_id"), col("kv.term").as("term"),
          col("kv.tf").as("tf"), col("kv.score").as("score"),
          (col("i") + 1).cast("long").as("rk"))
    })

  /** C4-style heuristic quality gate (Raffel et al. 2020, the public
    * rule set): drop docs containing '{' (code/markup), containing
    * "lorem ipsum" (placeholder boilerplate), shorter than 5 words,
    * or not ending in terminal punctuation. Each rule emits its own
    * verdict column so a curation run can report per-rule kill rates,
    * plus the conjunction `keep`. Pure narrow map — fully map-side at
    * any corpus size, no shuffle at all until a consumer aggregates. */
  val c4Gate: NamedQuery = NamedQuery("q151_c4_gate",
    Some("""SELECT doc_id,
           |  NOT contains(text, '{') AS r_brace,
           |  NOT contains(lower(text), 'lorem ipsum') AS r_lorem,
           |  len(string_split(text, ' ')) >= 5 AS r_minwords,
           |  right(trim(text), 1) IN ('.', '!', '?', '"') AS r_terminal,
           |  (NOT contains(text, '{')
           |   AND NOT contains(lower(text), 'lorem ipsum')
           |   AND len(string_split(text, ' ')) >= 5
           |   AND right(trim(text), 1) IN ('.', '!', '?', '"')) AS keep
           |FROM documents""".stripMargin),
    (s, d) => {
      val rBrace = !col("text").contains("{")
      val rLorem = !lower(col("text")).contains("lorem ipsum")
      val rMin = graft.functions.TokenCount.tokenCount(col("text")) >= 5
      val rTerm = substring(trim(col("text")), -1, 1).isin(".", "!", "?", "\"")
      t(s, d, "documents").select(col("doc_id"),
        rBrace.as("r_brace"), rLorem.as("r_lorem"),
        rMin.as("r_minwords"), rTerm.as("r_terminal"),
        (rBrace && rLorem && rMin && rTerm).as("keep"))
    })

  /** The q151 rule set applied to any documents frame, unpivoted to
    * one row per (doc, rule) — shared by the q157 report and the
    * engine's `curationReport` verb over managed tables. */
  private[graft] def c4Report(docs: DataFrame): DataFrame = {
    val rBrace = !col("text").contains("{")
    val rLorem = !lower(col("text")).contains("lorem ipsum")
    val rMin = graft.functions.TokenCount.tokenCount(col("text")) >= 5
    val rTerm = substring(trim(col("text")), -1, 1).isin(".", "!", "?", "\"")
    val rules = array(
      struct(lit("r_brace").as("rule"), rBrace.as("pass")),
      struct(lit("r_lorem").as("rule"), rLorem.as("pass")),
      struct(lit("r_minwords").as("rule"), rMin.as("pass")),
      struct(lit("r_terminal").as("rule"), rTerm.as("pass")))
    docs.select(col("source"), explode(rules).as("r"))
      .groupBy(col("source"), col("r.rule").as("rule"))
      .agg(count(lit(1)).as("n_docs"),
        count_if(!col("r.pass")).as("n_killed"))
      .withColumn("kill_rate",
        round(col("n_killed") * 1.0 / col("n_docs"), 4))
      .orderBy("source", "rule")
  }

  /** Curation report — the table an operator actually reads after a
    * C4-gate run: per (source, rule) document counts, kill counts, and
    * kill rates. The gate itself is a narrow map; the unpivot is a
    * 4-element in-row explode (no join), and the single shuffle is the
    * (source × rule)-cardinality aggregation — |sources|·4 groups, map-
    * side combined, so the report costs one pass over the corpus at
    * any scale. A rule whose kill rate spikes for one source is the
    * canonical "a feed went bad" alarm in a daily crawl. */
  val curationReport: NamedQuery = NamedQuery("q157_curation_report",
    Some("""WITH g AS (SELECT source,
           |    NOT contains(text, '{') AS r_brace,
           |    NOT contains(lower(text), 'lorem ipsum') AS r_lorem,
           |    len(string_split(text, ' ')) >= 5 AS r_minwords,
           |    right(trim(text), 1) IN ('.', '!', '?', '"') AS r_terminal
           |  FROM documents),
           |u AS (
           |  SELECT source, 'r_brace' AS rule, r_brace AS pass FROM g
           |  UNION ALL SELECT source, 'r_lorem', r_lorem FROM g
           |  UNION ALL SELECT source, 'r_minwords', r_minwords FROM g
           |  UNION ALL SELECT source, 'r_terminal', r_terminal FROM g)
           |SELECT source, rule, CAST(count(*) AS BIGINT) AS n_docs,
           |  CAST(count(*) FILTER (WHERE NOT pass) AS BIGINT) AS n_killed,
           |  round(count(*) FILTER (WHERE NOT pass) * 1.0 / count(*), 4)
           |    AS kill_rate
           |FROM u GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
    (s, d) => c4Report(t(s, d, "documents")))

  /** CCNet-style LM quality scoring (Wenzek et al. 2020, "CCNet:
    * Extracting High Quality Monolingual Datasets from Web Crawl
    * Data"): score each document by the mean negative log-probability
    * of its word bigrams under a bigram LM trained on the corpus
    * itself, then split the corpus into head/middle/tail terciles —
    * the standard perplexity-bucketing step of a crawl-curation
    * pipeline (CCNet keeps "head", inspects "middle", drops "tail").
    *
    * Trained-on-scored corpus means every scored bigram exists in the
    * count table, so the model needs no smoothing and the score is
    * exact — the distributable formulation:
    *  - bigram counts: explode + groupBy (one token-scale shuffle,
    *    map-side combined);
    *  - conditionals: P(w2|w1) = c(w1 w2) / Σ_w c(w1 w), computed on
    *    the vocabulary-scale count frame (unigram frame derived from
    *    the bigram frame — no second corpus pass);
    *  - scoring: ONE corpus-scale equi-join from doc bigrams to the
    *    per-bigram log-prob (8-byte-hashable string key), then a
    *    per-doc aggregate;
    *  - tercile boundaries: the distinct-ROUNDED-score frame is
    *    RANGE-bounded (score ∈ [0, ~20] nats × 1e4 steps), not
    *    corpus-bounded, so the one-task cumulative window over it is
    *    scale-safe at any corpus size, same argument as q56's bucket
    *    frame.
    * Boundary rule is percentile_disc spelled out structurally (min
    * score with cum ≥ N·p) — identical construction on the oracle
    * side, so no cross-engine quantile-semantics dependence. */
  val lmQuality: NamedQuery = NamedQuery("q158_lm_quality",
    Some("""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws
           |          FROM documents),
           |bg AS (SELECT doc_id,
           |         unnest(list_transform(range(1, len(ws)),
           |           i -> ws[i] || ' ' || ws[i+1])) AS b
           |       FROM w WHERE len(ws) >= 2),
           |bc AS (SELECT b, count(*) AS c2 FROM bg GROUP BY b),
           |uc AS (SELECT string_split(b, ' ')[1] AS w1, sum(c2) AS c1
           |       FROM bc GROUP BY 1),
           |lp AS (SELECT b, ln(c2 * 1.0 / c1) AS lp FROM bc
           |       JOIN uc ON string_split(bc.b, ' ')[1] = uc.w1),
           |sc AS (SELECT doc_id, round(-avg(lp), 4) AS score
           |       FROM bg JOIN lp USING (b) GROUP BY doc_id),
           |d AS (SELECT score, count(*) AS c FROM sc GROUP BY score),
           |cum AS (SELECT score,
           |          sum(c) OVER (ORDER BY score) AS cum,
           |          sum(c) OVER () AS n FROM d),
           |b AS (SELECT min(score) FILTER (WHERE cum >= n / 3.0) AS b1,
           |             min(score) FILTER (WHERE cum >= n * 2 / 3.0) AS b2
           |      FROM cum)
           |SELECT doc_id, score,
           |  CASE WHEN score <= b1 THEN 'head'
           |       WHEN score <= b2 THEN 'middle'
           |       ELSE 'tail' END AS bucket
           |FROM sc, b""".stripMargin),
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val bg = t(s, d, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("ws"))
        .filter(size(col("ws")) >= 2)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(0, size(ws) - 2), " +
            "i -> concat(ws[i], ' ', ws[i + 1]))")).as("b"))
      val bc = bg.groupBy("b").agg(count(lit(1)).as("c2"))
      val uc = bc.groupBy(split(col("b"), " ").getItem(0).as("w1"))
        .agg(sum("c2").as("c1"))
      val lp = bc
        .join(uc, split(bc("b"), " ").getItem(0) === uc("w1"))
        .select(col("b"), log(col("c2") * lit(1.0) / col("c1")).as("lp"))
      // cached: the tercile bounds AND the output both consume sc; un-
      // cached, the whole corpus-scale score pipeline (explode + join +
      // per-doc agg) executes twice. The frame is narrow (doc_id,
      // double) — per-doc not per-token — so the cache is the cheapest
      // artifact in the query at any corpus size (sf1: 18.7 → ~7 s).
      val sc = bg.join(lp, "b").groupBy("doc_id")
        .agg(round(-avg("lp"), 4).as("score"))
        .cache()
      // distinct-rounded-score frame: range-bounded, one-task window OK
      val wCum = Window.orderBy("score")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAll = Window.partitionBy()
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val cum = sc.groupBy("score").agg(count(lit(1)).as("c"))
        .withColumn("cum", sum("c").over(wCum))
        .withColumn("n", sum("c").over(wAll))
      val bounds = cum.agg(
        min(when(col("cum") >= col("n") / 3.0, col("score"))).as("b1"),
        min(when(col("cum") >= col("n") * 2 / 3.0, col("score"))).as("b2"))
      sc.crossJoin(broadcast(bounds))
        .select(col("doc_id"), col("score"),
          when(col("score") <= col("b1"), "head")
            .when(col("score") <= col("b2"), "middle")
            .otherwise("tail").as("bucket"))
    })

  /** Gopher REPETITION rules (Rae et al. 2021 table A1, the n-gram
    * half q167 does not cover): per document, the fraction of
    * characters inside the single most frequent {2,3,4}-gram
    * (thresholds 0.20/0.18/0.16) and inside duplicated {5,10}-grams
    * (0.15/0.10) — the gate that kills boilerplate and template spam.
    * Adaptations, documented: the corpus is single-line so the
    * line/paragraph rules degenerate and are omitted; the duplicated
    * fraction counts occurrences (Σ count·len over grams seen ≥ 2,
    * capped at 1.0) rather than merging overlapping character spans —
    * span-union exactness is q173's job.
    *
    * Determinism: every numerator/denominator is an exact integer
    * (char lengths, counts); each fraction is ONE division rounded to
    * 4dp, and the keep verdict compares the ROUNDED fractions, so both
    * engines decide identically. The top-gram argmax ties break on the
    * gram string.
    *
    * Scale shape: all n-grams of a document live in its ONE row, so
    * each n value is a codegen'd single-pass expression
    * ([[graft.functions.GramStats]]) inside the scan — ZERO shuffles,
    * ZERO explodes; the gate pipelines through the corpus at any size
    * (the TermCounts law: per-document state never crosses the
    * cluster. The first formulation's five (doc, n, gram) corpus
    * aggregations were its entire 22 s sf1 cost; this one is
    * scan-bound). */
  val gopherRepetition: NamedQuery = {
    val ns = Seq(2, 3, 4, 5, 10)
    val gramsSql = ns.map(n =>
      s"""SELECT doc_id, $n AS n, unnest(list_transform(
         |    range(1, greatest(len(ws) - ${n - 2}, 1)),
         |    i -> array_to_string(list_slice(ws, i, i + ${n - 1}), ' ')))
         |    AS g
         |  FROM w""".stripMargin).mkString("\nUNION ALL\n")
    NamedQuery("q185_gopher_repetition",
      Some(s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws
              |          FROM documents),
              |grams AS (
              |$gramsSql),
              |counts AS (SELECT doc_id, n, g, count(*) AS c
              |           FROM grams GROUP BY 1, 2, 3),
              |top AS (SELECT doc_id, n, c * len(g) AS tc FROM (
              |    SELECT *, row_number() OVER (PARTITION BY doc_id, n
              |      ORDER BY c DESC, g) AS rn FROM counts) WHERE rn = 1),
              |dup AS (SELECT doc_id, n,
              |    sum(CASE WHEN c >= 2 THEN c * len(g) ELSE 0 END) AS dc
              |  FROM counts GROUP BY 1, 2),
              |f AS (SELECT d.doc_id, len(d.text) AS tl,
              |    coalesce(max(CASE WHEN t.n = 2 THEN t.tc END), 0) AS tc2,
              |    coalesce(max(CASE WHEN t.n = 3 THEN t.tc END), 0) AS tc3,
              |    coalesce(max(CASE WHEN t.n = 4 THEN t.tc END), 0) AS tc4,
              |    coalesce(max(CASE WHEN u.n = 5 THEN u.dc END), 0) AS dc5,
              |    coalesce(max(CASE WHEN u.n = 10 THEN u.dc END), 0) AS dc10
              |  FROM documents d
              |  LEFT JOIN top t ON t.doc_id = d.doc_id
              |  LEFT JOIN dup u ON u.doc_id = d.doc_id AND u.n = t.n
              |  GROUP BY 1, 2),
              |r AS (SELECT doc_id,
              |    round(tc2 * 1.0 / tl, 4) AS top2,
              |    round(tc3 * 1.0 / tl, 4) AS top3,
              |    round(tc4 * 1.0 / tl, 4) AS top4,
              |    round(least(dc5 * 1.0 / tl, 1.0), 4) AS dup5,
              |    round(least(dc10 * 1.0 / tl, 1.0), 4) AS dup10
              |  FROM f)
              |SELECT doc_id, top2, top3, top4, dup5, dup10,
              |  (top2 <= 0.20 AND top3 <= 0.18 AND top4 <= 0.16
              |   AND dup5 <= 0.15 AND dup10 <= 0.10) AS keep
              |FROM r""".stripMargin),
      (s, d) => {
        import graft.functions.GramStats.gramStats
        // every n-gram of a doc lives in its one row: all five n
        // values are codegen'd single-pass expressions inside the
        // scan — ZERO shuffles, ZERO explodes (PlanQualitySpec law)
        val base = t(s, d, "documents").select(
          col("doc_id") +: length(col("text")).as("tl") +:
            ns.map(n => gramStats(col("text"), n).as(s"g$n")): _*)
        val top2 = round(col("g2.tc") * lit(1.0) / col("tl"), 4)
        val top3 = round(col("g3.tc") * lit(1.0) / col("tl"), 4)
        val top4 = round(col("g4.tc") * lit(1.0) / col("tl"), 4)
        val dup5 = round(least(col("g5.dc") * lit(1.0) / col("tl"),
          lit(1.0)), 4)
        val dup10 = round(least(col("g10.dc") * lit(1.0) / col("tl"),
          lit(1.0)), 4)
        base.select(col("doc_id"),
          top2.as("top2"), top3.as("top3"), top4.as("top4"),
          dup5.as("dup5"), dup10.as("dup10"),
          (top2 <= 0.20 && top3 <= 0.18 && top4 <= 0.16 &&
            dup5 <= 0.15 && dup10 <= 0.10).as("keep"))
      })
  }

  /** Gopher quality rules (Rae et al. 2021, "Scaling Language Models:
    * Methods, Analysis & Insights from Training Gopher", table A1) —
    * the repetition-free subset expressible as per-document statistics:
    * word count in [50, 100 000], mean word length in [3, 10], ≥ 80 %
    * of words containing an alphabetic character, and ≥ 2 stop-word
    * TOKENS (the paper counts distinct required words; this corpus has
    * a synthetic vocabulary, so the adapted rule counts occurrences —
    * documented deviation). Complements q151 (C4 heuristics) and q158
    * (CCNet LM quality) as the third published quality gate.
    *
    * Determinism: mean_wl and alpha_frac are single divisions of exact
    * integer sums — bit-identical across engines; rounding is display
    * precision, not drift control. Scale shape: pure narrow map, zero
    * shuffle — pipelines inside the corpus scan at any size. */
  val gopherGate: NamedQuery = NamedQuery("q167_gopher_gate",
    Some("""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws
           |          FROM documents),
           |m AS (SELECT doc_id, len(ws) AS n_words,
           |  list_aggregate(list_transform(ws, x -> len(x)), 'sum')
           |    AS sum_wl,
           |  len(list_filter(ws, x -> regexp_matches(x, '[a-z]')))
           |    AS n_alpha,
           |  len(list_filter(ws, x -> x IN ('the', 'be', 'to', 'of',
           |    'and', 'that', 'have', 'with'))) AS stop_hits
           |  FROM w)
           |SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
           |  round(sum_wl * 1.0 / n_words, 4) AS mean_wl,
           |  round(n_alpha * 1.0 / n_words, 4) AS alpha_frac,
           |  CAST(stop_hits AS BIGINT) AS stop_hits,
           |  n_words BETWEEN 50 AND 100000 AS r_words,
           |  sum_wl * 1.0 / n_words BETWEEN 3 AND 10 AS r_wordlen,
           |  n_alpha * 1.0 / n_words >= 0.8 AS r_alpha,
           |  stop_hits >= 2 AS r_stop,
           |  (n_words BETWEEN 50 AND 100000
           |   AND sum_wl * 1.0 / n_words BETWEEN 3 AND 10
           |   AND n_alpha * 1.0 / n_words >= 0.8
           |   AND stop_hits >= 2) AS keep
           |FROM m""".stripMargin),
    (s, d) => {
      val m = t(s, d, "documents").select(col("doc_id"),
        graft.functions.TokenCount.tokenCount(col("text")).as("n_words"),
        expr("aggregate(split(text, ' '), 0L, (acc, x) -> acc + length(x))")
          .as("sum_wl"),
        expr("size(filter(split(text, ' '), x -> x rlike '[a-z]'))")
          .cast("long").as("n_alpha"),
        expr("size(filter(split(text, ' '), x -> x IN ('the', 'be', " +
          "'to', 'of', 'and', 'that', 'have', 'with')))")
          .cast("long").as("stop_hits"))
      val meanWl = col("sum_wl") * 1.0 / col("n_words")
      val alphaFrac = col("n_alpha") * 1.0 / col("n_words")
      val rWords = col("n_words").between(50, 100000)
      val rWordlen = meanWl.between(3, 10)
      val rAlpha = alphaFrac >= 0.8
      val rStop = col("stop_hits") >= 2
      m.select(col("doc_id"), col("n_words"),
        round(meanWl, 4).as("mean_wl"),
        round(alphaFrac, 4).as("alpha_frac"),
        col("stop_hits"),
        rWords.as("r_words"), rWordlen.as("r_wordlen"),
        rAlpha.as("r_alpha"), rStop.as("r_stop"),
        (rWords && rWordlen && rAlpha && rStop).as("keep"))
    })

  /** Tokenizer fertility report per (lang, source): BPE-ish tokens per
    * whitespace word (fertility) and characters per BPE token
    * (compression) — the table a pipeline reads before fixing a token
    * budget per language, and the standard cross-lingual tokenizer-
    * quality diagnostic (a language with outlier fertility is getting
    * over-fragmented). Uses the q65 BPE-ish regex so the two reports
    * agree on what a token is.
    *
    * Determinism: all sums are exact integers; each ratio is ONE
    * division of exact ints — bit-identical across engines. Scale
    * shape: narrow in-row token counts, then a |lang × source|-group
    * aggregation with map-side combine — one corpus pass. */
  val fertility: NamedQuery = NamedQuery("q169_tokenizer_fertility",
    Some("""WITH m AS (SELECT lang, source,
           |  len(string_split(text, ' ')) AS tok_ws,
           |  len(regexp_extract_all(text, '[a-z]+|[0-9]+')) AS tok_bpe,
           |  n_chars FROM documents)
           |SELECT lang, source, count(*) AS n_docs,
           |  CAST(sum(tok_ws) AS BIGINT) AS tok_ws,
           |  CAST(sum(tok_bpe) AS BIGINT) AS tok_bpe,
           |  CAST(sum(n_chars) AS BIGINT) AS chars,
           |  round(sum(tok_bpe) * 1.0 / sum(tok_ws), 4) AS fertility,
           |  round(sum(n_chars) * 1.0 / nullif(sum(tok_bpe), 0), 4)
           |    AS chars_per_tok
           |FROM m GROUP BY lang, source""".stripMargin),
    (s, d) => t(s, d, "documents").select(col("lang"), col("source"),
        graft.functions.TokenCount.tokenCount(col("text")).as("tok_ws"),
        size(regexp_extract_all(col("text"), lit("[a-z]+|[0-9]+"), lit(0)))
          .cast("long").as("tok_bpe"),
        col("n_chars"))
      .groupBy("lang", "source")
      .agg(count(lit(1)).as("n_docs"),
        sum("tok_ws").as("tok_ws"), sum("tok_bpe").as("tok_bpe"),
        sum("n_chars").as("chars"),
        round(sum("tok_bpe") * 1.0 / sum("tok_ws"), 4).as("fertility"),
        // a group whose text has no [a-z0-9] runs sums tok_bpe to 0;
        // guard the divisor on BOTH sides (nullif above) so each engine
        // yields NULL — Spark's Divide nulls on /0 while DuckDB's IEEE
        // float division returns inf, which would break oracle parity
        round(when(sum("tok_bpe") =!= 0,
          sum("n_chars") * 1.0 / sum("tok_bpe")), 4)
          .as("chars_per_tok")))

  def defs: Seq[NamedQuery] =
    Seq(tokens, quality, langId, fingerprint, rollingFp, bpeTokens,
      piiScrub, normalize, repetition, heavyHitters, tfidf, c4Gate,
      curationReport, lmQuality, bm25, bm25Served, bm25Maintained,
      hybridRetrieval, hybridDenseAudit, hybridServed, gopherGate,
      gopherRepetition, fertility)
}
