package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Source/sink round-trips (SURVEY §2.3): parquet primary; CSV and JSON
  * write→register→query with values intact. */
class SourcesSpec extends SparkSpec {

  private lazy val engine: Engine = Engine(spark)

  private def roundtrip(format: String): Unit = {
    val base = s"src_rt_${format}_${System.nanoTime()}"
    val dir = Files.createTempDirectory(s"graft_$format").toString
    engine.registerTable(base, s"$sf/nation.parquet")
    engine.writeTable(base, s"$dir/out", format)
    engine.registerTable(s"${base}_back", s"$dir/out", format)
    val orig = engine.table(base)
      .select(col("n_nationkey").cast("long"), col("n_name"))
      .orderBy("n_nationkey").collect()
    val back = engine.table(s"${base}_back")
      .select(col("n_nationkey").cast("long"), col("n_name"))
      .orderBy("n_nationkey").collect()
    assert(orig.sameElements(back), s"$format roundtrip mismatch")
    engine.dropTable(base); engine.dropTable(s"${base}_back")
  }

  test("parquet roundtrip")(roundtrip("parquet"))
  test("csv roundtrip")(roundtrip("csv"))
  test("json roundtrip")(roundtrip("json"))

  test("partitioned write prunes partitions on a filtered read") {
    import org.apache.spark.sql.classic.ClassicConversions.castToImpl
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val base = s"part_write_${System.nanoTime()}"
    val dir = Files.createTempDirectory("graft_part").toString
    engine.registerTable(base, Tables.t(spark, sf, "events")
      .select("event_id", "event_type", "value"))
    engine.writeTable(base, s"$dir/out", "parquet", Seq("event_type"))
    engine.registerTable(s"${base}_back", s"$dir/out")
    val filtered = engine.table(s"${base}_back")
      .filter(col("event_type") === "click")
    val expected = Tables.t(spark, sf, "events")
      .filter(col("event_type") === "click").count()
    assert(filtered.count() == expected)
    // the partition filter must reach the scan: pruned scans read only
    // the matching directory, never the full table
    val scans = castToImpl(filtered).queryExecution.executedPlan.collect {
      case a: AdaptiveSparkPlanExec => a.executedPlan.collect {
        case sc: FileSourceScanExec => sc
      }
      case sc: FileSourceScanExec => Seq(sc)
    }.flatten
    assert(scans.nonEmpty)
    assert(scans.head.partitionFilters.nonEmpty,
      "partition filter not pushed to the scan")
    assert(scans.head.relation.partitionSchema.fieldNames
      .contains("event_type"))
    engine.dropTable(base); engine.dropTable(s"${base}_back")
  }

  test("unsupported format raises") {
    intercept[IllegalArgumentException](
      engine.registerTable("nope", "/tmp/x", "avro"))
  }

  test("q141 sorted export: shard key ranges are disjoint and sorted") {
    // run the export (writes to the query's temp dir), then verify the
    // layout property file-by-file: every shard covers a disjoint
    // l_shipdate range and is internally non-decreasing — the
    // binary-searchable layout the operator promises
    SparkEntry.queries("q141_sorted_export")(spark, sf).collect()
    val dir = new java.io.File(
      s"${sys.props("java.io.tmpdir")}/graft_roundtrip_sorted_lineitem")
    val files = Option(dir.listFiles).toSeq.flatten
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
    assert(files.size >= 2, s"expected multiple shards, got ${files.size}")
    val ranges = files.map { f =>
      // cast to ISO string (sorts like the timestamp; the column reads
      // back as NTZ, whose JVM type varies by reader settings)
      val df = spark.read.parquet(f.getPath)
        .select(date_format(col("l_shipdate"), "yyyy-MM-dd HH:mm:ss.SSSSSS"))
      // per-file sortedness: the read of ONE file is a single split at
      // this size, so collect order is file order
      val vals = df.collect().map(_.getString(0))
      assert(vals.zip(vals.drop(1)).forall { case (a, b) => a <= b },
        s"${f.getName} is not internally sorted")
      (vals.head, vals.last)
    }.sortBy(_._1)
    ranges.zip(ranges.drop(1)).foreach { case ((_, hiA), (loB, _)) =>
      assert(hiA <= loB, s"shard ranges overlap: $hiA > $loB")
    }
  }

  test("q148 shuffled export: disjoint shards, pure membership, " +
      "cluster-size independent") {
    SparkEntry.queries("q148_shuffled_export")(spark, sf).collect()
    val root = new java.io.File(
      s"${sys.props("java.io.tmpdir")}/graft_roundtrip_shuffled_documents")
    val shardDirs = Option(root.listFiles).toSeq.flatten
      .filter(_.getName.startsWith("shard=")).sortBy(_.getName)
    assert(shardDirs.size == 4, s"expected 4 shards, got ${shardDirs.size}")
    val hex = "0123456789abcdef"
    val seqs = shardDirs.map { sd =>
      val shardId = sd.getName.stripPrefix("shard=").toLong
      val files = sd.listFiles.filter(_.getName.endsWith(".parquet"))
      assert(files.length == 1, s"${sd.getName}: one file per shard")
      // one file = one split at this size → collect order is file order
      val rows = spark.read.parquet(files.head.getPath)
        .select("h", "doc_id").collect()
        .map(r => (r.getString(0), r.getLong(1)))
      val hs = rows.map(_._1)
      assert(hs.zip(hs.drop(1)).forall { case (a, b) => a <= b },
        s"${sd.getName} not sorted by seeded hash")
      // membership is a pure row function: every row's recomputed shard
      // must equal its directory — disjointness follows
      rows.foreach { case (h, _) =>
        assert((hex.indexOf(h.head)) % 4 == shardId,
          s"row with h=$h landed in wrong shard $shardId")
      }
      shardId -> rows.map(_._2).toSeq
    }.toMap
    assert(seqs.values.map(_.size).sum ==
      spark.read.parquet(s"$sf/documents.parquet").count())
    // cluster-size independence: re-export from a DIFFERENT pre-shuffle
    // partitioning (different task count and input order) — same seed
    // must yield the identical per-shard doc_id sequences
    val dir2 = Files.createTempDirectory("graft_q148_alt").toString
    operators.SourceOps.exportShuffled(spark, sf, dir2,
      preShufflePartitions = Some(3))
    val back2 = spark.read.parquet(dir2)
    val seqs2 = back2.select("shard", "h", "doc_id").collect()
      .map(r => (r.getInt(0).toLong, r.getString(1), r.getLong(2)))
      .groupBy(_._1)
      .view.mapValues(_.sortBy(x => (x._2, x._3)).map(_._3).toSeq).toMap
    assert(seqs2 == seqs, "shard layout changed with cluster size")
  }

  test("q146 row-level quarantine contract (named-row diagnostics)") {
    // q146's oracle pins aggregate counts; this probe asserts the
    // SPECIFIC per-row PERMISSIVE verdicts so that a Spark-upgrade
    // parser-behavior change (UnivocityParser token-count handling has
    // differed across releases) produces a named-row failure here
    // instead of an opaque oracle-hash mismatch in the driver gate.
    val dir = Files.createTempDirectory("graft_q146_probe").toString
    import spark.implicits._
    Seq("10,alice,1.0", "x,oops,1.5", "20,bob,2.0", "30,carol",
      "40,dan,4.0,extra,cols,beyond,schema").toDS()
      .coalesce(1).write.mode("overwrite").text(dir)
    val back = spark.read.schema("id INT, name STRING, v DOUBLE, _corrupt STRING")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .csv(dir)
      .select("id", "name", "_corrupt").collect()
      .map(r => Option(r.get(1)).map(_.toString).getOrElse("<null-name>") ->
        (Option(r.get(0)), r.isNullAt(2))).toMap
    // good rows: well-formed, short (null-filled), and extra-token
    // (truncated) — each keyed by name for a readable failure
    assert(back("alice") == (Some(10), true), "well-formed row flagged bad")
    assert(back("carol") == (Some(30), true), "short row must null-fill GOOD")
    assert(back("dan") == (Some(40), true), "extra-token row must stay GOOD")
    assert(back("bob") == (Some(20), true))
    // the only BAD row: a field failing its declared type ('x' as INT)
    assert(back("oops") == (None, false), "type-failed row must quarantine")
  }

  test("footer stats equal the full-scan aggregate and plan no data scan") {
    val df = SparkEntry.queries("q182_footer_stats")(spark, sf)
    // the footer path must not contain a parquet DATA scan at all —
    // its only input is the in-memory file list
    assert(scansOf(df).isEmpty, "footer path planned a parquet data scan")
    val out = df.collect()(0)
    val scan = Tables.t(spark, sf, "lineitem").agg(
      count(lit(1)), count(col("l_extendedprice")),
      min("l_orderkey"), max("l_orderkey")).collect()(0)
    assert(out.getLong(0) == scan.getLong(0), "row count mismatch")
    assert(out.getLong(1) == scan.getLong(1), "non-null count mismatch")
    assert(out.getLong(2) == scan.getLong(2), "min mismatch")
    assert(out.getLong(3) == scan.getLong(3), "max mismatch")
  }

  test("footer stats hold on a directory-shaped, Spark-written table") {
    val dir = Files.createTempDirectory("graft_footer").toString
    val src = Tables.t(spark, sf, "lineitem")
    src.repartition(4).write.mode("overwrite")
      .parquet(s"$dir/lineitem.parquet")
    val out = SparkEntry.queries("q182_footer_stats")(spark, dir).collect()(0)
    val scan = src.agg(count(lit(1)), count(col("l_extendedprice")),
      min("l_orderkey"), max("l_orderkey")).collect()(0)
    assert((0 to 3).forall(i => out.getLong(i) == scan.getLong(i)),
      s"footer stats drifted on multi-file layout: $out vs $scan")
  }
}
