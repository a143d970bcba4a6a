package graft

import org.apache.spark.sql.functions._

/** Whole-catalog `EXPORT DATABASE '<dir>'` / `IMPORT DATABASE '<dir>'`
  * — the DuckDB verbs a user reaches for to move or back up an entire
  * database. Data lands as one parquet directory per table
  * (self-describing schema, distributed part-file writes — the same
  * scale shape as COPY); engine-level catalog state that parquet
  * cannot carry — ENUM types and column bindings, NOT NULL flags,
  * SET DEFAULT expressions, degraded-type origins (SURVEY §1.2), and
  * index-registry entries — rides small parquet manifest tables under
  * `<dir>/catalog/`. A parquet manifest instead of DuckDB's schema.sql
  * keeps arbitrary default expressions and enum values out of any
  * hand-rolled SQL-escaping path, and the read-back is just a scan.
  *
  * IMPORT recreates tables with [[EngineDdl.createTableAs]] over the
  * parquet read (schema travels with the data) and injects the
  * manifest metadata directly into the catalog maps — no per-column
  * re-validation scans (the exporting engine already enforced the
  * constraints; re-probing N tables × M columns on import would read
  * the whole database again). Existing table/enum names raise the
  * standard catalog errors — IMPORT targets a fresh engine, like
  * DuckDB's. */
private[graft] trait EngineExport { self: Engine =>

  /** Export every managed table + catalog metadata to `dir`. Returns
    * the number of tables exported. */
  def exportDatabase(dir: String): Long = {
    import spark.implicits._
    val names = tableNames
    names.foreach { t =>
      copyTo(table(t), s"$dir/data/$t.parquet", Map("format" -> "parquet"))
    }
    def one(df: org.apache.spark.sql.DataFrame, name: String): Unit =
      df.coalesce(1).write.mode("overwrite")
        .parquet(s"$dir/catalog/$name.parquet")
    one(names.toDF("table_name"), "tables")
    one(enums.toSeq.flatMap { case (e, vs) =>
      vs.zipWithIndex.map { case (v, i) => (e, i, v) }
    }.toDF("enum_name", "ord", "value"), "enums")
    one(names.flatMap { t =>
      table(t).columns.map { c =>
        (t, c, notNullCols.contains((t, c)), defaults.get((t, c)),
          enumCols.get((t, c)), typeOrigins.get((t, c)))
      }
    }.toDF("table_name", "column_name", "not_null", "default_expr",
      "enum_type", "type_origin"), "columns")
    one(indexRegistry.toSeq.map { case (ix, (t, cols)) =>
      // serving-index kind + build metadata ride along so a restored
      // engine refreshes against the right columns/path and keeps
      // serving indexes out of conflict-target inference
      val (kind, m1, m2, m3) =
        textMeta.get(ix).map { case (p, i, c) => ("text", p, i, c) }
          .orElse(annMeta.get(ix).map { case (i, e) =>
            ("ann", i, e, annPath.get(ix).orNull) })
          .orElse(tokenizerMeta.get(ix).map(c => ("tokenizer", c, null, null)))
          .orElse(classifierMeta.get(ix).map(c => ("classifier", c, null, null)))
          .orElse(shingleMeta.get(ix).map { case (p, dt, mdf) =>
            ("shingle", p, dt, mdf.toString) })
          .getOrElse(if (servingIndexes.contains(ix))
            ("serving", null, null, null) else ("plain", null, null, null))
      (ix, t, cols.mkString(","), kind, m1, m2, m3)
    }.toDF("index_name", "table_name", "columns", "kind",
      "meta1", "meta2", "meta3"), "indexes")
    // text/ANN serving ARTIFACTS copy under <dir>/artifacts/<ix>/ so
    // the export is SELF-CONTAINED: a cross-host import re-points the
    // index at the copy and serves probes + refreshes without a
    // rebuild. (The artifact's managed read-back tables also export as
    // ordinary data tables above — cheap duplication that keeps plain
    // table semantics for them.) An index whose artifact is already
    // unreachable exports metadata-only, preserving the import-side
    // rebuild refusal.
    indexRegistry.keys.foreach { ix =>
      textMeta.get(ix).map(_._1).orElse(annPath.get(ix))
        .orElse(shingleMeta.get(ix).map(_._1)).foreach { src =>
          copyArtifactDir(src, s"$dir/artifacts/$ix")
        }
    }
    names.size.toLong
  }

  private def copyArtifactDir(src: String, dst: String): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val (sfs, sp) = hadoopFs(src)
    if (!sfs.exists(sp)) return
    val (dfs, dp) = hadoopFs(dst)
    // a re-export to the same dir must REPLACE the artifact copy:
    // FileUtil.copy into an existing directory NESTS the source under
    // it, which would leave the previous export's postings in place —
    // an import would then silently serve the stale corpus
    dfs.delete(dp, true)
    org.apache.hadoop.fs.FileUtil.copy(sfs, sp, dfs, dp,
      false /* keep source */, true /* overwrite */, conf)
    ()
  }

  /** Import a database previously written by [[exportDatabase]].
    * Every manifest name is validated against the live catalog AND
    * cross-checked within the manifest BEFORE anything is created, so a
    * collision or a hand-corrupted manifest raises with the catalog
    * untouched instead of leaving a half-imported database. Returns the
    * number of tables created. */
  def importDatabase(dir: String): Long = {
    val cat = spark.read.parquet(s"$dir/catalog/tables.parquet")
      .collect().map(_.getString(0)).sorted
    val enumRows = spark.read.parquet(s"$dir/catalog/enums.parquet")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2)))
    val colRows = spark.read.parquet(s"$dir/catalog/columns.parquet")
      .collect()
    val idx = spark.read.parquet(s"$dir/catalog/indexes.parquet")
    val hasKind = idx.columns.contains("kind") // pre-r16 manifests lack it
    val idxRows = idx.collect()
    // ---- validate everything up front (no catalog writes yet) ----
    def exists(p: String): Boolean = artifactExists(p)
    cat.foreach { t =>
      if (tableExists(t))
        throw new IllegalArgumentException(
          s"""Catalog Error: Table with name "$t" already exists!""")
      // a manifest table whose data directory is missing would throw
      // mid-create-loop and leave a half-imported catalog — refuse
      // before anything is created
      if (!exists(s"$dir/data/$t.parquet"))
        throw new IllegalArgumentException(
          "IO Error: IMPORT DATABASE manifest lists table " +
            s""""$t" but "$dir/data/$t.parquet" is missing""")
    }
    val newEnums = enumRows.map(_._1).toSet
    newEnums.foreach { e =>
      if (enums.contains(e))
        throw new IllegalArgumentException(
          s"Catalog Error: Type with name $e already exists!")
    }
    val catSet = cat.toSet
    colRows.foreach { r =>
      if (!catSet.contains(r.getString(0)))
        throw new IllegalArgumentException(
          "Catalog Error: IMPORT DATABASE manifest references unknown " +
            s"""table "${r.getString(0)}"""")
      if (!r.isNullAt(4) && !newEnums.contains(r.getString(4)))
        throw new IllegalArgumentException(
          "Catalog Error: IMPORT DATABASE manifest references unknown " +
            s"""enum type "${r.getString(4)}"""")
    }
    idxRows.foreach { r =>
      // a silently-skipped name collision would attach the manifest's
      // serving metadata to an UNRELATED live index — refuse up front
      if (indexRegistry.contains(r.getString(0)))
        throw new IllegalArgumentException(
          s"""Catalog Error: Index with name "${r.getString(0)}" """ +
            "already exists!")
      if (!catSet.contains(r.getString(1)))
        throw new IllegalArgumentException(
          "Catalog Error: IMPORT DATABASE manifest references unknown " +
            s"""table "${r.getString(1)}"""")
    }
    // ---- create: enums first — enum column bindings reference them --
    enumRows.groupBy(_._1).toSeq.sortBy(_._1).foreach { case (e, rows) =>
      createEnum(e, rows.sortBy(_._2).map(_._3).toSeq)
    }
    cat.foreach { t =>
      createTableAs(t, spark.read.parquet(s"$dir/data/$t.parquet"))
    }
    colRows.foreach { r =>
      val key = (r.getString(0), r.getString(1))
      if (r.getBoolean(2)) notNullCols.put(key, ())
      if (!r.isNullAt(3)) defaults.put(key, r.getString(3))
      if (!r.isNullAt(4)) enumCols.put(key, r.getString(4))
      if (!r.isNullAt(5)) typeOrigins.put(key, r.getString(5))
    }
    idxRows.foreach { r =>
      val name = r.getString(0)
      createIndex(name, r.getString(1), r.getString(2).split(",").toSeq)
      if (hasKind) {
        def m(i: Int) = if (r.isNullAt(i)) null else r.getString(i)
        // prefer the export's own artifact copy (<dir>/artifacts/<ix>)
        // over the build-time path: the copy travels with the manifest,
        // so a cross-host restore serves probes AND refreshes without a
        // rebuild. Pre-r17 exports (no copy) keep the recorded path and
        // its unreachable-path refusal.
        val artifactCopy = s"$dir/artifacts/$name"
        r.getString(3) match {
          case "text" =>
            val p = if (exists(s"$artifactCopy/postings")) artifactCopy
              else m(4)
            textMeta.put(name, (p, m(5), m(6)))
            servingIndexes.put(name, ())
            if (p != null && exists(s"$p/postings")) {
              registerTextIndex(name, p)
              // seed the maintenance introspection: without a base,
              // the first post-import refresh reads tail_frac as
              // tail/(tail+0) = 1.0 and the OPTIMIZE-cadence signal is
              // garbage (ADVICE r17)
              indexTail.put(name,
                (0L, statsOf(name).map(_._1).getOrElse(0L)))
            }
          case "ann" =>
            annMeta.put(name, (m(4), m(5)))
            val p = if (exists(s"$artifactCopy/cells")) artifactCopy
              else m(6)
            Option(p).foreach(annPath.put(name, _))
            if (p != null && exists(s"$p/cells")) {
              val cells = spark.read.parquet(s"$p/cells")
              put(s"${name}_cells", cells)
              // parquet footer count — metadata-only, no data scan
              indexTail.put(name, (0L, cells.count()))
            }
            servingIndexes.put(name, ())
          case "shingle" =>
            // prefer the export's artifact copy, like text/ANN: the
            // restored engine refreshes (and re-registers on refresh)
            // against the copy, so the artifact travels with the db
            val p = if (exists(artifactCopy)) artifactCopy else m(4)
            shingleMeta.put(name, (p, m(5),
              Option(m(6)).map(_.toInt).getOrElse(1000)))
            servingIndexes.put(name, ())
            if (p != null && exists(p))
              put(name, spark.read.parquet(p))
          case "tokenizer" =>
            tokenizerMeta.put(name, m(4)); servingIndexes.put(name, ())
          case "classifier" =>
            classifierMeta.put(name, m(4)); servingIndexes.put(name, ())
          case "serving" => servingIndexes.put(name, ())
          case _ => () // plain metadata index
        }
      }
    }
    cat.length.toLong
  }
}
