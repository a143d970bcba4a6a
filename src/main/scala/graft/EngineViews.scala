package graft

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.classic.ClassicConversions.castToImpl
import org.apache.spark.sql.functions._

/** Materialized aggregates (build / incremental refresh / rewrite
  * arming), the extension registry (duckdb_extensions() observable
  * parity), and ENUM types with declaration-order semantics. Split
  * from Engine.scala along its section seam; state and semantics
  * unchanged. */
private[graft] trait EngineViews { self: Engine =>

  // ---- materialized aggregates ----------------------------------------
  // (name → (definition, base registry entry at build time)); the entry
  // identity is the staleness stamp — any DML/ALTER swaps the base's
  // entry, which silently disables the rewrite until refresh.
  private[graft] val matViews = TrieMap.empty[String, (MatViewDef, TableEntry)]

  /** Materialize the distributive partials (per measure m: sum_m, min_m,
    * max_m, cnt_m; plus n_rows) of `base` grouped by `dims`, store to
    * parquet at `path`, and register the cold read-back as managed table
    * `name`. SQL aggregates over `base` covered by (dims, measures) are
    * then rewritten to re-aggregate this artifact
    * ([[graft.plans.MatViewRewrite]]) — at 100 TB the fact scan+shuffle
    * collapses to a dims-cardinality parquet scan. The MV is built from
    * the registry plan directly (no temp-view alias), so its own build
    * and refresh can never match the rewrite pattern. */
  def createMaterializedAggregate(name: String, base: String,
      dims: Seq[String], measures: Seq[String], path: String): Unit =
    withTableLock(name) {
      val entry = registry.getOrElse(base, missing(base))
      val have = entry.df.columns.map(_.toLowerCase).toSet
      (dims ++ measures).find(c => !have.contains(c.toLowerCase)).foreach(c =>
        throw new IllegalArgumentException(
          s"Binder Error: column $c not found in table $base"))
      val overlap = dims.map(_.toLowerCase).toSet
        .intersect(measures.map(_.toLowerCase).toSet)
      if (overlap.nonEmpty)
        throw new IllegalArgumentException("Binder Error: a column " +
          s"cannot be both dimension and measure: ${overlap.mkString(", ")}")
      val aggs = measures.flatMap(mcol => Seq(
        sum(col(mcol)).as(s"sum_$mcol"), min(col(mcol)).as(s"min_$mcol"),
        max(col(mcol)).as(s"max_$mcol"),
        count(col(mcol)).as(s"cnt_$mcol"))) :+ count(lit(1)).as("n_rows")
      entry.df.groupBy(dims.map(col): _*).agg(aggs.head, aggs.tail: _*)
        .write.mode("overwrite").parquet(path)
      put(name, spark.read.parquet(path))
      matViews.put(name, (MatViewDef(name, base, dims, measures, path),
        entry))
    }

  /** Storage path for SQL-created MVs (`CREATE MATERIALIZED VIEW`) —
    * per-JVM so concurrent benches never collide, same discipline as
    * the persisted shingle index. */
  private[graft] def defaultMvPath(name: String): String =
    s"${sys.props("java.io.tmpdir")}/graft_mv_" +
      s"${ProcessHandle.current.pid}_$name"

  /** Drop an MV by name; raises unless `ifExists` when the name is not
    * a registered materialized aggregate (a plain table stays guarded
    * behind DROP TABLE). */
  def dropMaterializedAggregate(name: String,
      ifExists: Boolean = false): Unit = {
    if (!matViews.contains(name)) {
      if (ifExists) return
      throw new IllegalArgumentException(
        s"Catalog Error: materialized aggregate $name does not exist")
    }
    dropTable(name)
  }

  /** Bring an MV up to the CURRENT base state and re-arm the rewrite
    * (the daily-ingest cadence: DML lands, MVs refresh). INCREMENTAL
    * when every base mutation since the MV's stamp was a pure INSERT
    * (the [[put]] append-lineage chain reaches the stamp): the deltas'
    * partials merge into the stored artifact — sums/counts add,
    * mins/maxes combine — so the refresh scans the DELTA plus the
    * dims-cardinality artifact, never the corpus. At 100 TB with a
    * daily append that is the difference between a corpus rescan and a
    * seconds-long merge. Any row-rewriting verb (DELETE/MERGE/ALTER)
    * breaks the chain and the refresh falls back to a full rebuild
    * (min/max are not differentiable under deletion).
    * @return the path taken: "noop" | "incremental" | "rebuild" */
  def refreshMaterializedAggregate(name: String): String = {
    val (d, stamp) = matViews.getOrElse(name,
      throw new IllegalArgumentException(
        s"Catalog Error: materialized aggregate $name does not exist"))
    val current = registry.getOrElse(d.base, missing(d.base))
    if (current eq stamp) return "noop"
    @annotation.tailrec
    def deltasBackTo(e: TableEntry, acc: List[DataFrame])
        : Option[List[DataFrame]] =
      if (e eq stamp) Some(acc)
      else e.appendOf match {
        case Some((parent, delta)) => deltasBackTo(parent, delta :: acc)
        case None => None
      }
    deltasBackTo(current, Nil) match {
      case Some(deltas) => withTableLock(name) {
        val deltaDf = deltas.reduce(_ unionByName _)
        val aggs = d.measures.flatMap(m => Seq(
          sum(col(m)).as(s"sum_$m"), min(col(m)).as(s"min_$m"),
          max(col(m)).as(s"max_$m"),
          count(col(m)).as(s"cnt_$m"))) :+ count(lit(1)).as("n_rows")
        val deltaPart = deltaDf.groupBy(d.dims.map(col): _*)
          .agg(aggs.head, aggs.tail: _*)
        val old = spark.read.parquet(d.path)
        val merge = d.measures.flatMap(m => Seq(
          sum(col(s"sum_$m")).as(s"sum_$m"),
          min(col(s"min_$m")).as(s"min_$m"),
          max(col(s"max_$m")).as(s"max_$m"),
          sum(col(s"cnt_$m")).as(s"cnt_$m"))) :+
          sum(col("n_rows")).as("n_rows")
        // cast back to the artifact's exact schema: re-summing a sum
        // widens decimals, and the rewrite must keep producing the same
        // result types as the direct plan
        val merged = old.unionByName(deltaPart)
          .groupBy(d.dims.map(col): _*).agg(merge.head, merge.tail: _*)
          .select(old.schema.fields.toIndexedSeq
            .map(f => col(f.name).cast(f.dataType).as(f.name)): _*)
        val tmp = d.path + "_refresh_tmp"
        merged.write.mode("overwrite").parquet(tmp)
        val fs = org.apache.hadoop.fs.FileSystem.getLocal(
          spark.sparkContext.hadoopConfiguration)
        fs.delete(new org.apache.hadoop.fs.Path(d.path), true)
        fs.rename(new org.apache.hadoop.fs.Path(tmp),
          new org.apache.hadoop.fs.Path(d.path))
        put(name, spark.read.parquet(d.path))
        matViews.put(name, (d, current))
        "incremental"
      }
      case None =>
        createMaterializedAggregate(name, d.base, d.dims, d.measures,
          d.path)
        "rebuild"
    }
  }

  /** MVs whose base is untouched since their build — the only ones the
    * rewrite may use. Correctness never depends on freshness. */
  private[graft] def freshMatViews: Seq[MatViewDef] =
    matViews.values.collect {
      case (d, stamp) if registry.get(d.base).exists(_ eq stamp) => d
    }.toSeq

  private[graft] def analyzedPlanOf(name: String)
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    castToImpl(table(name)).queryExecution.analyzed

  // ---- extension registry (duckdb_extensions() observable parity) -------
  // Loading a NATIVE extension binary is n/a on Spark (format handlers
  // are built-in sources), but the reference's observable contract
  // (test_extension_loading.test: pre-load listing shows loaded=false,
  // the load verb flips loaded+installed) is catalog state, which
  // replays exactly. Spark's natively-shipped formats list as already
  // loaded — the honest translation of "this capability is available".
  private val extensionRegistry =
    TrieMap[String, (Boolean, Boolean)](
      "azure" -> ((false, false)), "aws" -> ((false, false)),
      "httpfs" -> ((false, false)), "iceberg" -> ((false, false)),
      "json" -> ((true, true)), "parquet" -> ((true, true)))

  /** ≈ duckherder_load_extension → server-side LoadExtension
    * (distributed_server_function.cpp): records the extension as
    * loaded+installed; the native dlopen is n/a by design. */
  def loadExtension(name: String): Unit =
    extensionRegistry.put(name, (true, true))

  /** ≈ duckdb_extensions() introspection (test_extension_loading.test). */
  def extensions: DataFrame = {
    import spark.implicits._
    extensionRegistry.toSeq.sortBy(_._1)
      .map { case (n, (l, i)) => (n, l, i) }
      .toDF("extension_name", "loaded", "installed")
  }

  // ---- ENUM types (declaration-order semantics) -------------------------

  def createEnum(name: String, values: Seq[String]): Unit = {
    if (enums.contains(name))
      throw new IllegalArgumentException(
        s"Catalog Error: Type with name $name already exists!")
    enums.put(name, values)
  }

  def dropEnum(name: String, ifExists: Boolean = false): Unit =
    if (enums.remove(name).isEmpty && !ifExists)
      throw new IllegalArgumentException(
        s"Catalog Error: Type with name $name does not exist!")

  /** Declaration-order rank of an enum column — ORDER BY / MIN / MAX over
    * `enumOrd` reproduces DuckDB's enum comparison semantics
    * (enum_type_support.test:62-81). */
  def enumOrd(enumName: String, c: Column): Column = {
    val values = enums.getOrElse(enumName, throw new IllegalArgumentException(
      s"Catalog Error: Type with name $enumName does not exist!"))
    array_position(lit(values.toArray), c)
  }

  def enumValues(name: String): Seq[String] = enums.getOrElse(name, Seq.empty)
}
