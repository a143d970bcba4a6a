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
      // serving indexes out of conflict-target inference. The text/ANN
      // ARTIFACT tables export as ordinary data tables; the text
      // index's parquet path must still be reachable from the importing
      // host for REFRESH — otherwise rebuild with CREATE TEXT INDEX.
      val (kind, m1, m2, m3) =
        textMeta.get(ix).map { case (p, i, c) => ("text", p, i, c) }
          .orElse(annMeta.get(ix).map { case (i, e) =>
            ("ann", i, e, annPath.get(ix).orNull) })
          .orElse(tokenizerMeta.get(ix).map(c => ("tokenizer", c, null, null)))
          .orElse(classifierMeta.get(ix).map(c => ("classifier", c, null, null)))
          .getOrElse(if (servingIndexes.contains(ix))
            ("serving", null, null, null) else ("plain", null, null, null))
      (ix, t, cols.mkString(","), kind, m1, m2, m3)
    }.toDF("index_name", "table_name", "columns", "kind",
      "meta1", "meta2", "meta3"), "indexes")
    names.size.toLong
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
    cat.foreach { t =>
      if (tableExists(t))
        throw new IllegalArgumentException(
          s"""Catalog Error: Table with name "$t" already exists!""")
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
        r.getString(3) match {
          case "text" =>
            textMeta.put(name, (m(4), m(5), m(6)))
            servingIndexes.put(name, ())
          case "ann" =>
            annMeta.put(name, (m(4), m(5)))
            Option(m(6)).foreach(annPath.put(name, _))
            servingIndexes.put(name, ())
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
