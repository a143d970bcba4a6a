package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

/** The inventory-un-shrinkable gate: EVERY `SparkEntry.queries` key runs
  * against BOTH physical events encodings — int64-nanos (the legacy
  * writer) and parquet `timestamp[us]` without timezone (the current
  * writer, read as TIMESTAMP_NTZ) — and must produce identical results
  * on both. Round 8 lost 10 oracle rows and shipped one silently-wrong
  * streaming answer because the suite only ever saw whichever encoding
  * `/root/testdata` happened to hold; this spec pins the full matrix
  * (the §1.2 timestamp matrix the reference handles at
  * /root/reference/src/arrow_utils.cpp:561-583), so a reader that
  * breaks — or silently shifts — on either encoding fails loudly here,
  * and a basket that shrinks below the full key count fails the size
  * law. */
class EventsEncodingSpec extends SparkSpec {

  /** Write `df` as a SINGLE parquet file at `dest` (the testdata layout:
    * one file named events.parquet, which the streaming readers' filename
    * glob depends on). */
  private def writeSingleFile(df: DataFrame, dest: Path): Unit = {
    val tmp = Files.createTempDirectory("graft_enc_stage")
    df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = {
      val s = Files.list(tmp)
      try s.filter(p => p.getFileName.toString.endsWith(".parquet"))
        .findFirst().get()
      finally s.close()
    }
    Files.move(part, dest, StandardCopyOption.REPLACE_EXISTING)
  }

  /** Two fixture dirs sharing every non-events table (symlinks into the
    * sf0.001 testdata) and differing only in the events file's physical
    * ts encoding. */
  private lazy val (nsDir, usDir): (String, String) = {
    val base = Files.createTempDirectory("graft_encodings")
    val ns = Files.createDirectories(base.resolve("ns"))
    val us = Files.createDirectories(base.resolve("us"))
    for (t <- Tables.names if t != "events"; d <- Seq(ns, us))
      Files.createSymbolicLink(
        d.resolve(s"$t.parquet"), Paths.get(s"$sf/$t.parquet"))
    val ev = Tables.t(spark, sf, "events") // canonical (ts µs, ts_ns)
    val cols = Seq("event_id", "ts", "user_id", "event_type", "value",
      "props").map(col)
    writeSingleFile(ev.withColumn("ts", col("ts_ns")).select(cols: _*),
      ns.resolve("events.parquet"))
    writeSingleFile(
      ev.withColumn("ts", col("ts").cast("timestamp_ntz")).select(cols: _*),
      us.resolve("events.parquet"))
    (ns.toString, us.toString)
  }

  test("fixture sanity: the two dirs really hold different encodings") {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    assert(spark.read.parquet(s"$nsDir/events.parquet")
      .schema("ts").dataType == LongType)
    assert(spark.read.parquet(s"$usDir/events.parquet")
      .schema("ts").dataType == TimestampNTZType)
  }

  test("inventory size law: the basket can never shrink") {
    // 181 keys as of round 14 (r12/r13: q176/q177 IVF-PQ, q178/q179
    // BPE, q180 audio; r14: q181 NB classifier, q182 footer stats,
    // q183 stream classify, q184 hybrid retrieval, q185 Gopher
    // repetition, q186 classifier eval, on top of r11's 171) — raise this floor when
    // queries are added, never lower it: a key that stops resolving
    // or throws at analysis must fail this suite, not silently fall
    // out of the driver basket.
    // r15: q187 plain-UPDATE roundtrip (183); r16: q188 hybrid dense
    // audit + q189 ANN-served hybrid + q190 NB discrimination (186);
    // r16b: q191 join-form UPDATE, q192 DELETE USING, q193 INSERT ON
    // CONFLICT (189); r17: q194 COPY TO/FROM roundtrip, q195
    // RETURNING, q196 index-served BM25, q197 EXPORT/IMPORT
    // DATABASE (193); r18: q198 index-maintenance lifecycle (194)
    assert(SparkEntry.queries.size >= 194,
      s"queries inventory shrank to ${SparkEntry.queries.size} keys")
  }

  test("instant-TIMESTAMP encoding (third matrix branch) normalizes to " +
      "the same canonical events frame") {
    // Spark writes TimestampType as instant-semantics parquet
    // (isAdjustedToUTC=true), which reads back as TimestampType — the
    // one branch the ns/µs fixtures don't reach
    val base = Files.createTempDirectory("graft_enc_instant")
    val canonical = Tables.t(spark, sf, "events")
    val cols = Seq("event_id", "ts", "user_id", "event_type", "value",
      "props").map(col)
    spark.conf.set("spark.sql.parquet.outputTimestampType",
      "TIMESTAMP_MICROS")
    writeSingleFile(canonical.select(cols: _*),
      base.resolve("events.parquet"))
    val raw = spark.read.parquet(s"$base/events.parquet")
    assert(raw.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
    val again = Tables.normalizeEvents(raw)
    val a = canonical.select("event_id", "ts", "ts_ns").collect()
      .map(_.toString).sorted.toSeq
    val b = again.select("event_id", "ts", "ts_ns").collect()
      .map(_.toString).sorted.toSeq
    assert(a == b, "instant-TIMESTAMP round-trip diverged")
  }

  test("unsupported events ts encoding fails loudly, not silently") {
    val bad = Tables.t(spark, sf, "events")
      .withColumn("ts", col("ts").cast("string"))
      .drop("ts_ns")
    val e = intercept[IllegalArgumentException](
      Tables.normalizeEvents(bad))
    assert(e.getMessage.contains("unsupported physical type"))
  }

  test("oracle coverage law: only the seven engine-defined-hash queries " +
      "may lack DuckDB oracle SQL") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    // each of these carries a green companion audit row (q119-q122;
    // q171's twin is q172, q176's is q177, q189's is q188). q178
    // graduated to a real oracle in r14 (pinned merge table +
    // recursive-CTE replay).
    assert(noOracle == Set("q42_dedup_minhash_lsh", "q43_dedup_simhash",
      "q46_ann_lsh", "q75_ann_ivf", "q171_dedup_then_ann",
      "q176_ann_ivfpq", "q189_hybrid_served"),
      s"oracle-less queries drifted: $noOracle — new queries must ship " +
        "with oracleSql or a documented audit twin")
  }

  private def canon(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  for (q <- SparkEntry.queries.keys.toSeq.sorted) {
    test(s"$q runs identically on ns-int64 and µs-NTZ events encodings") {
      val a = canon(SparkEntry.queries(q)(spark, nsDir))
      val b = canon(SparkEntry.queries(q)(spark, usDir))
      assert(a.nonEmpty, s"$q returned no rows")
      assert(a == b,
        s"$q differs between events encodings: ns-int64 gave ${a.size} " +
          s"rows, µs-NTZ gave ${b.size}; first diff: " +
          a.zipAll(b, "<missing>", "<missing>")
            .find { case (x, y) => x != y }.getOrElse(("", "")))
    }
  }
}
