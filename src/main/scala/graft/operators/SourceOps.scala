package graft.operators

import org.apache.spark.sql.functions._

import graft.Tables.t

/** Source/sink connector coverage (SURVEY.md §2.3): the reference's only
  * native source is DuckDB storage, with parquet/json readers loadable as
  * extensions (`duckherder_load_extension`, docs/README.md Usage); Spark
  * ships CSV and JSON connectors natively. These queries PROVE that
  * surface rather than claim it: each writes a driver table out through
  * the connector, reads it back with an explicit schema, and emits an
  * aggregate + row-fidelity check that the DuckDB oracle recomputes from
  * the original parquet — any value mangled in transit (quoting,
  * timestamp rendering, float text round-trip, unicode) flips the hash.
  *
  * Scale shape: both writer and reader are the distributed connectors —
  * one file per partition out, line-splittable scans back (CSV/JSON scans
  * parallelize per file; at 100 TB the write fans out across executors
  * and the read re-splits). The local temp dir stands in for the object
  * store an actual deployment would target.
  */
object SourceOps {

  private def tmp(name: String): String =
    s"${sys.props("java.io.tmpdir")}/graft_roundtrip_$name"

  /** CSV round-trip on `orders` (BIGINT, VARCHAR, DOUBLE, TIMESTAMP):
    * write → schema-read → join back to the original on the key and
    * aggregate per status, counting any row whose re-read columns differ.
    * Doubles survive via Spark's shortest-round-trip rendering;
    * timestamps via the ISO writer format. */
  val csvRoundtrip: NamedQuery = NamedQuery("q132_csv_roundtrip",
    Some("""SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_orders,
           |  round(sum(o_totalprice), 2) AS total,
           |  min(o_orderdate) AS first_date,
           |  CAST(0 AS BIGINT) AS n_mismatch
           |FROM orders GROUP BY o_orderstatus""".stripMargin),
    (s, d) => {
      val orders = t(s, d, "orders")
      val dir = tmp("csv_orders")
      orders.write.mode("overwrite").option("header", "true").csv(dir)
      val back = s.read.option("header", "true").schema(orders.schema)
        .csv(dir)
      val orig = orders.select(col("o_orderkey"),
        col("o_custkey").as("x_custkey"),
        col("o_orderstatus").as("x_status"),
        col("o_totalprice").as("x_price"),
        col("o_orderdate").as("x_date"),
        col("o_orderpriority").as("x_priority"))
      back.join(orig, Seq("o_orderkey"))
        .groupBy("o_orderstatus").agg(
          count(lit(1)).as("n_orders"),
          round(sum("o_totalprice"), 2).as("total"),
          min("o_orderdate").as("first_date"),
          // null-safe inequality: a value mangled into NULL by a
          // PERMISSIVE-mode parse failure must COUNT as a mismatch, and
          // plain =!= yields NULL (uncounted) on NULL input.
          count_if(!(col("o_custkey") <=> col("x_custkey")) ||
            !(col("o_orderstatus") <=> col("x_status")) ||
            !(col("o_totalprice") <=> col("x_price")) ||
            !(col("o_orderdate") <=> col("x_date")) ||
            !(col("o_orderpriority") <=> col("x_priority"))).as("n_mismatch"))
    })

  /** JSON round-trip on `documents` (free text with spaces/quoting is the
    * hazard): write → schema-read → per-source aggregate + text-identity
    * check against the original. */
  val jsonRoundtrip: NamedQuery = NamedQuery("q133_json_roundtrip",
    Some("""SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           |  CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
           |  CAST(0 AS BIGINT) AS n_mismatch
           |FROM documents GROUP BY source""".stripMargin),
    (s, d) => {
      val docs = t(s, d, "documents")
      val dir = tmp("json_documents")
      docs.write.mode("overwrite").json(dir)
      val back = s.read.schema(docs.schema).json(dir)
      val orig = docs.select(col("doc_id"), col("text").as("x_text"),
        col("lang").as("x_lang"), col("n_chars").as("x_chars"))
      back.join(orig, Seq("doc_id"))
        .groupBy("source").agg(
          count(lit(1)).as("n_docs"),
          sum("n_chars").as("sum_chars"),
          countDistinct("lang").as("n_langs"),
          count_if(!(col("text") <=> col("x_text")) ||
            !(col("lang") <=> col("x_lang")) ||
            !(col("n_chars") <=> col("x_chars"))).as("n_mismatch"))
    })

  /** ORC round-trip on `lineitem` (BIGINT/INTEGER/DOUBLE/VARCHAR/
    * TIMESTAMP mix, composite key): the columnar sink/source pair next
    * to parquet in any lakehouse. Same null-safe fidelity contract as
    * the CSV/JSON trips — ORC is binary columnar so the hazard is type
    * mapping (timestamp epoch/zone, double payload), not quoting. */
  val orcRoundtrip: NamedQuery = NamedQuery("q136_orc_roundtrip",
    Some("""SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_rows,
           |  round(sum(l_extendedprice), 2) AS total,
           |  CAST(sum(l_linenumber) AS BIGINT) AS sum_line,
           |  min(l_shipdate) AS first_ship,
           |  CAST(0 AS BIGINT) AS n_mismatch
           |FROM lineitem GROUP BY l_returnflag""".stripMargin),
    (s, d) => {
      val li = t(s, d, "lineitem")
      val dir = tmp("orc_lineitem")
      li.write.mode("overwrite").orc(dir)
      val back = s.read.schema(li.schema).orc(dir)
      // No natural key is guaranteed unique in the synthetic tiers (a
      // non-unique join key cross-matches rows and reports phantom
      // mismatches), so the fidelity join uses a MULTISET row identity:
      // (full-row hash, duplicate ordinal). Identical rows are
      // interchangeable, so the arbitrary ordinal among them is sound;
      // any column mangled in transit changes the hash, misses the
      // join, and counts as a mismatch through the null-safe compares.
      def rid(df: org.apache.spark.sql.DataFrame) = {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("__rh").orderBy(lit(1))
        df.withColumn("__rh", xxhash64(df.columns.map(col): _*))
          .withColumn("__ri", row_number().over(w))
      }
      val key = Seq("__rh", "__ri")
      val orig = rid(li).select((key.map(col) :+
        col("l_quantity").as("x_qty") :+
        col("l_extendedprice").as("x_price") :+
        col("l_returnflag").as("x_flag") :+
        col("l_shipdate").as("x_ship")): _*)
      rid(back).join(orig, key, "left_outer")
        .groupBy("l_returnflag").agg(
          count(lit(1)).as("n_rows"),
          round(sum("l_extendedprice"), 2).as("total"),
          sum("l_linenumber").cast("long").as("sum_line"),
          min("l_shipdate").as("first_ship"),
          count_if(!(col("l_quantity") <=> col("x_qty")) ||
            !(col("l_extendedprice") <=> col("x_price")) ||
            !(col("l_returnflag") <=> col("x_flag")) ||
            !(col("l_shipdate") <=> col("x_ship"))).as("n_mismatch"))
    })

  /** Hive-partitioned parquet sink (`partitionBy("lang")`) + pruned
    * read-back — THE production layout for a multi-language corpus: a
    * reader filtering on the partition column opens only that
    * partition's directories. At 100 TB with ~30 languages this turns a
    * full-corpus scan into a listing-time prune — no file of a filtered-
    * out language is touched (PlanQualitySpec asserts the filter lands
    * in PartitionFilters, not post-scan). The write itself fans out per
    * (task, lang) — no shuffle, no single-writer bottleneck. */
  val partitionedSink: NamedQuery = NamedQuery("q137_partitioned_sink",
    Some("""SELECT lang, source, CAST(count(*) AS BIGINT) AS n_docs,
           |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS sum_tokens
           |FROM documents WHERE lang IN ('en', 'de')
           |GROUP BY lang, source""".stripMargin),
    (s, d) => {
      val docs = t(s, d, "documents")
      val dir = tmp("part_documents")
      docs.write.mode("overwrite").partitionBy("lang").parquet(dir)
      s.read.parquet(dir)
        .filter(col("lang").isin("en", "de"))
        .groupBy("lang", "source").agg(
          count(lit(1)).as("n_docs"),
          sum("n_chars").as("sum_chars"),
          sum(graft.functions.TokenCount.tokenCount(col("text"))).as("sum_tokens"))
    })

  /** Globally range-sorted export: `repartitionByRange` +
    * `sortWithinPartitions` writes shards that cover DISJOINT,
    * internally-sorted key ranges — the binary-searchable layout a
    * time-keyed lakehouse table wants (a reader seeking one date range
    * opens one shard, and every shard's parquet footer min/max prunes
    * row groups for free on BOTH engines). The range exchange samples
    * key quantiles, so shards are balanced even on skewed keys.
    * SourcesSpec reads each written file individually and asserts the
    * disjoint-and-sorted property; the query itself hash-checks
    * fidelity through the round-trip. */
  val sortedExport: NamedQuery = NamedQuery("q141_sorted_export",
    Some("""SELECT CAST(count(*) AS BIGINT) AS n_rows,
           |  min(l_shipdate) AS first_ship, max(l_shipdate) AS last_ship,
           |  round(sum(l_extendedprice), 2) AS total
           |FROM lineitem""".stripMargin),
    (s, d) => {
      val li = t(s, d, "lineitem")
      val dir = tmp("sorted_lineitem")
      li.repartitionByRange(8, col("l_shipdate"))
        .sortWithinPartitions("l_shipdate")
        .write.mode("overwrite").parquet(dir)
      s.read.parquet(dir).agg(count(lit(1)).as("n_rows"),
        min("l_shipdate").as("first_ship"),
        max("l_shipdate").as("last_ship"),
        round(sum("l_extendedprice"), 2).as("total"))
    })

  /** PERMISSIVE-mode corrupt-record accounting — the ingestion behavior
    * the q132/q133 null-safe checks guard against, proven directly: a
    * CSV with known-malformed lines must surface EXACTLY the bad rows in
    * the corrupt-record column (never silently null a field into the
    * good set), and the good rows must aggregate clean. The fixture is
    * deterministic (five fixed lines, two malformed: a non-numeric id
    * and a truncated row) and written through the distributed text
    * sink; the oracle pins the exact expected counts. At scale this is
    * the quarantine path of an ingestion job — corrupt rows routed to a
    * dead-letter table instead of poisoning the corpus. */
  val csvCorrupt: NamedQuery = NamedQuery("q146_csv_corrupt",
    Some("""SELECT CAST(4 AS BIGINT) AS n_good, CAST(1 AS BIGINT) AS n_bad,
           |  CAST(100 AS BIGINT) AS sum_id, 'x,oops,1.5' AS worst_bad""".stripMargin),
    (s, d) => {
      val dir = tmp("csv_corrupt")
      val spark = s
      import spark.implicits._
      Seq("10,alice,1.0", "x,oops,1.5", "20,bob,2.0", "30,carol",
        "40,dan,4.0,extra,cols,beyond,schema").toDS()
        .coalesce(1).write.mode("overwrite").text(dir)
      val schema = "id INT, name STRING, v DOUBLE, _corrupt STRING"
      val back = s.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .csv(dir)
      // the pinned contract (Spark CSV PERMISSIVE): a short row
      // ('30,carol') null-fills and stays GOOD; extra tokens
      // ('40,…,extra,…') are truncated and stay GOOD; only a field
      // that fails its declared type ('x' as INT) is quarantined into
      // the corrupt column. sum_id covers exactly the valid ids — a
      // change in any of these rules flips the oracle hash.
      // SPARK-VERSION DEPENDENCY: the token-count-mismatch rules are
      // parser behavior (UnivocityParser), not a stable API contract —
      // some Spark 3.x releases flagged length-mismatched rows as
      // malformed. Pinned against Spark 4.1 here; on an upgrade, run
      // SourcesSpec's "q146 row-level quarantine contract" probe first:
      // it asserts the SPECIFIC rows by id, so a behavior change shows
      // up as a named-row diagnostic instead of an opaque oracle-hash
      // mismatch.
      back.agg(
        count_if(col("_corrupt").isNull).as("n_good"),
        count_if(col("_corrupt").isNotNull).as("n_bad"),
        sum(when(col("_corrupt").isNull, col("id"))).as("sum_id"),
        min(col("_corrupt")).as("worst_bad"))
    })

  /** Seeded deterministic SHUFFLE-shard export — the complement of the
    * q141 range-sorted layout: a training pipeline needs a reproducible
    * RANDOM order sharded to N files, where the same seed yields the
    * same shards and the same within-shard order on ANY cluster size.
    * Both shard membership and order are pure row functions of
    * (doc_id, seed): h = md5(doc_id || ':' || seed) gives a uniform
    * pseudo-random key; shard = first-hex-digit(h) mod N; within-shard
    * order = sort by h. No global sort, no sampled range boundaries
    * (repartitionByRange would tie the layout to the sample): the write
    * is one hash shuffle on `shard` + a local sort — at 100 TB this is
    * embarrassingly parallel and restart-safe (re-running a failed shard
    * rewrites byte-identical output). The returned audit re-reads the
    * written files and emits per-shard (count, positional checksum
    * sum(rank*doc_id), min/max h) — the DuckDB oracle recomputes the
    * same permutation from the raw table, so any membership or rank
    * deviation flips the hash. (The audit's per-shard window is
    * verification-only; the export path itself is window-free.) */
  val shuffledExport: NamedQuery = NamedQuery("q148_shuffled_export",
    Some("""WITH h AS (
           |  SELECT doc_id, md5(CAST(doc_id AS VARCHAR) || ':s42') AS h
           |  FROM documents),
           |s AS (
           |  SELECT doc_id, h,
           |    CAST((instr('0123456789abcdef', substring(h, 1, 1)) - 1) % 4
           |      AS BIGINT) AS shard
           |  FROM h),
           |r AS (
           |  SELECT shard, doc_id, h,
           |    row_number() OVER (PARTITION BY shard ORDER BY h, doc_id) AS rn
           |  FROM s)
           |SELECT shard, CAST(count(*) AS BIGINT) AS n_rows,
           |  CAST(sum(rn * doc_id) AS BIGINT) AS perm_sum,
           |  min(h) AS min_h, max(h) AS max_h
           |FROM r GROUP BY shard""".stripMargin),
    (s, d) => {
      val dir = tmp("shuffled_documents")
      exportShuffled(s, d, dir)
      val back = s.read.parquet(dir)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("shard").orderBy("h", "doc_id")
      back.withColumn("rn", row_number().over(w))
        .groupBy(col("shard").cast("long").as("shard"))
        .agg(count(lit(1)).as("n_rows"),
          sum(col("rn") * col("doc_id")).as("perm_sum"),
          min("h").as("min_h"), max("h").as("max_h"))
    })

  /** The q148 export path, callable with an explicit pre-shuffle
    * partitioning so SourcesSpec can prove cluster-size independence
    * (same seed → byte-identical shards under a different task count). */
  def exportShuffled(s: org.apache.spark.sql.SparkSession, d: String,
      dir: String, preShufflePartitions: Option[Int] = None): Unit = {
    val docs = t(s, d, "documents")
    val base = preShufflePartitions.fold(docs)(docs.repartition)
    val hashed = base.select(col("doc_id"),
        md5(concat(col("doc_id").cast("string"), lit(":s42"))).as("h"))
      .withColumn("shard",
        ((expr("instr('0123456789abcdef', substring(h, 1, 1))") - 1) % 4)
          .cast("long"))
    // repartition on the shard column puts each shard's rows in exactly
    // one task → one internally-sorted file per shard directory
    hashed.repartition(col("shard"))
      .sortWithinPartitions("shard", "h", "doc_id")
      .write.mode("overwrite").partitionBy("shard").parquet(dir)
  }

  /** Footer-statistics aggregate pushdown: COUNT(*) / COUNT(col) /
    * MIN / MAX answered from parquet FOOTERS — row-group row counts,
    * null counts, and typed min/max statistics — without reading a
    * single data page. This is the metadata fast path native engines
    * (including the reference's DuckDB core, parquet_metadata) use for
    * bare aggregates; Spark's scan always decodes pages for these, so
    * at 100 TB a `SELECT count(*)` costs a full corpus scan unless the
    * engine short-circuits it.
    *
    * Shape: the file listing distributes over executors and each task
    * reads only footers (KBs per file) — at 100 TB / ~1M files this is
    * a metadata-bounded job with NO driver-side footer loop, and the
    * final fold is over one tiny row per file. Statistics are trusted
    * only where parquet makes them exact: row counts are mandatory;
    * null counts and INT64 min/max come from chunk statistics and the
    * job FAILS LOUDLY (raise_error) if any chunk lacks them rather
    * than silently falling back or guessing — string min/max, which
    * parquet may truncate, is deliberately not offered.
    *
    * Correctness law: the footer path must equal the full-scan
    * aggregate — the oracle recomputes all four values by scanning. */
  val footerStats: NamedQuery = NamedQuery("q182_footer_stats",
    Some("""SELECT count(*) AS n_rows,
           |  count(l_extendedprice) AS n_price,
           |  min(l_orderkey) AS min_ok,
           |  max(l_orderkey) AS max_ok
           |FROM lineitem""".stripMargin),
    (s, d) => {
      import s.implicits._
      val files = FooterStats.parquetFiles(s, s"$d/lineitem.parquet")
      val perFile = s.createDataset(files)
        .repartition(math.min(files.size, 32))
        .mapPartitions { it =>
          import scala.jdk.CollectionConverters._
          val hconf = new org.apache.hadoop.conf.Configuration()
          it.map { p =>
            val in = org.apache.parquet.hadoop.util.HadoopInputFile
              .fromPath(new org.apache.hadoop.fs.Path(p), hconf)
            val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
            try {
              val blocks = r.getFooter.getBlocks.asScala.toSeq
              def chunk(b: org.apache.parquet.hadoop.metadata.BlockMetaData,
                  name: String) =
                b.getColumns.asScala
                  .find(_.getPath.toDotString == name)
                  .getOrElse(throw new IllegalStateException(
                    s"column $name missing in $p"))
              val rows = blocks.map(_.getRowCount).sum
              // a zero-row-group part file (a common writer artifact)
              // has well-defined contributions — rows 0, no min/max —
              // not missing statistics; only a chunk WITHOUT exact
              // stats flips ok off
              var ok = true
              var nPrice = 0L
              var minOk = Long.MaxValue
              var maxOk = Long.MinValue
              blocks.foreach { b =>
                val price = chunk(b, "l_extendedprice").getStatistics
                val okey = chunk(b, "l_orderkey").getStatistics
                if (price == null || !price.isNumNullsSet ||
                    okey == null || !okey.hasNonNullValue) ok = false
                else {
                  nPrice += chunk(b, "l_extendedprice").getValueCount -
                    price.getNumNulls
                  minOk = math.min(minOk,
                    okey.genericGetMin.asInstanceOf[java.lang.Long])
                  maxOk = math.max(maxOk,
                    okey.genericGetMax.asInstanceOf[java.lang.Long])
                }
              }
              (rows, nPrice, minOk, maxOk, ok)
            } finally r.close()
          }
        }
        .toDF("r", "np", "mn", "mx", "ok")
      perFile.agg(
        sum("r").as("n_rows"), sum("np").as("np"),
        min("mn").as("mn"), max("mx").as("mx"),
        min("ok").as("ok"))
        .select(col("n_rows"),
          when(col("ok"), col("np")).otherwise(raise_error(
            lit("parquet chunk without exact statistics — no footer path")))
            .as("n_price"),
          // min/max over zero rows is NULL (an all-empty table left the
          // neutral sentinels untouched), matching the scan aggregate
          when(col("ok") && col("n_rows") > 0, col("mn")).as("min_ok"),
          when(col("ok") && col("n_rows") > 0, col("mx")).as("max_ok"))
    })

  def defs: Seq[NamedQuery] =
    Seq(csvRoundtrip, jsonRoundtrip, orcRoundtrip, partitionedSink,
      sortedExport, csvCorrupt, shuffledExport, footerStats)
}
