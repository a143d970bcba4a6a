package graft

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DML verbs on managed tables — INSERT (distributed append, ≈
  * distributed_insert.cpp), whole-row and column-wise MERGE,
  * DELETE-as-predicate-inversion (≈ distributed_delete.cpp, minus the
  * driver collect), and exact dedup. All copy-on-write under the
  * per-table writer lock. Split from Engine.scala along its section
  * seam; state and semantics unchanged. */
private[graft] trait EngineDml { self: Engine =>

  /** Reject rand()/uuid()-class expressions in copy-on-write DML: the
    * rewrite evaluates the predicate on both the hit and miss slices
    * and the plan re-evaluates between the delta count and the final
    * union read, so a non-deterministic expression could lose or
    * duplicate rows and desync the returned count from the persisted
    * state. Resolution against the table runs first — an UNRESOLVED
    * function node does not yet expose its determinism. */
  private def requireDeterministic(df: DataFrame, c: Column,
      ctx: String): Unit = {
    val analyzed = df.select(c).queryExecution.analyzed
    if (analyzed.expressions.exists(e => !e.deterministic))
      throw new IllegalArgumentException(
        s"Binder Error: non-deterministic expression in $ctx is not " +
          "supported (copy-on-write DML evaluates it more than once)")
  }

  /** INSERT: the reference buffers all rows driver-side then replays one
    * giant VALUES statement (distributed_insert.cpp:26-100); here appended
    * data stays distributed (unionByName of DataFrames). */
  def insertInto(name: String, df: DataFrame): Unit = {
    insertIntoReturning(name, df); ()
  }

  /** INSERT returning the validated delta frame (defaults filled,
    * coercions applied) — the rows `INSERT … RETURNING` projects. The
    * frame is a lazy plan over the PRE-swap lineage, so it stays a
    * correct snapshot of exactly what was appended even after later
    * DML replaces the table. */
  private[graft] def insertIntoReturning(name: String,
      df: DataFrame): DataFrame = withTableLock(name) {
    val e = registry.getOrElse(name, missing(name))
    val delta = coerceAndValidate(name, e, df)
    put(name, e.df.unionByName(delta), appendDelta = Some(delta))
    delta
  }

  /** Shared INSERT/MERGE ingress path: positional column alignment, the
    * implicit DuckDB-style coercions, and the delta-bounded NOT NULL +
    * ENUM constraint probes. Throws (table untouched) on violation. */
  private def coerceAndValidate(name: String, e: TableEntry,
      df: DataFrame): DataFrame = {
    val aligned0 = df.toDF(e.df.columns.toIndexedSeq: _*)
    // degraded-carry columns first: ANSI interval input → comparable
    // struct (cast cannot), before the generic cast pass below
    val pre = e.df.schema.fields.foldLeft(aligned0) { (acc, f) =>
      (typeOrigins.get((name, f.name)), acc.schema(f.name).dataType) match {
        case (Some("INTERVAL"),
            _: org.apache.spark.sql.types.YearMonthIntervalType) =>
          acc.withColumn(f.name,
            Engine.intervalToStruct(acc.col(f.name), yearMonth = true))
        case (Some("INTERVAL"),
            _: org.apache.spark.sql.types.DayTimeIntervalType) =>
          acc.withColumn(f.name,
            Engine.intervalToStruct(acc.col(f.name), yearMonth = false))
        case _ => acc
      }
    }
    // implicit insert coercion (DuckDB casts VALUES to the column type:
    // '2023-01-01' into DATE[], [] into a typed empty list, …)
    val cast = e.df.schema.fields.foldLeft(pre) { (acc, f) =>
      if (acc.schema(f.name).dataType == f.dataType) acc
      else acc.withColumn(f.name, acc.col(f.name).cast(f.dataType))
    }
    // canonicalize degraded text carries so rendering and string ordering
    // match DuckDB: temporal text drops trailing fraction zeros, hugeint
    // text drops leading zeros
    val aligned = e.df.schema.fields.foldLeft(cast) { (acc, f) =>
      typeOrigins.get((name, f.name)) match {
        case Some("TIME") | Some("TIMESTAMP_NS") =>
          acc.withColumn(f.name, Engine.canonTemporalText(acc.col(f.name)))
        case Some("HUGEINT") | Some("UHUGEINT") =>
          acc.withColumn(f.name, Engine.canonIntegerText(acc.col(f.name)))
        case _ => acc
      }
    }
    // NOT NULL enforcement probes only the incoming delta (bounded by the
    // insert, early-terminating) so a rejected insert leaves the table
    // untouched — atomic like the reference's per-row constraint check
    val nn = e.df.columns.filter(c => notNullCols.contains((name, c)))
    if (nn.nonEmpty) {
      val anyNull = nn.map(aligned.col(_).isNull).reduce(_ || _)
      if (aligned.filter(anyNull).head(1).nonEmpty)
        throw new IllegalArgumentException(
          s"Constraint Error: NOT NULL constraint failed: " +
            s"$name(${nn.mkString(",")})")
    }
    // ENUM domain check (DuckDB raises a Conversion Error for a value
    // outside the type) — same bounded delta-only probe
    e.df.columns.foreach { c =>
      enumCols.get((name, c)).foreach { en =>
        val values = enums.getOrElse(en, Seq.empty)
        val bad = aligned.filter(aligned.col(c).isNotNull &&
          !aligned.col(c).isin(values: _*)).select(c).head(1)
        if (bad.nonEmpty)
          throw new IllegalArgumentException(
            s"Conversion Error: Could not convert string '${bad.head.get(0)}'" +
              s" to enum type $en")
      }
    }
    aligned
  }

  /** MERGE (upsert) as copy-on-write — beyond the reference's DML verb
    * set (INSERT/DELETE only): source rows matching the target on `keys`
    * REPLACE the matched rows whole-row; unmatched source rows append.
    * One left-anti join keeps the untouched target rows, one union
    * appends the source — shuffles on the key columns, never a driver
    * collect; at file-table scale this is the per-file rewrite
    * Delta/Iceberg perform. Standard MERGE forbids updating one target
    * row twice, so a source with duplicate NON-NULL keys raises (NULL
    * key values never equal anything under SQL join semantics — such
    * source rows always insert, and two NULL-key source rows are NOT
    * duplicates of each other). If the TARGET contains duplicate key
    * values (key uniqueness is not enforced on managed tables), all N
    * matched target rows are replaced by the single matching source row
    * — an explicit N-to-1 whole-row collapse, counted as ONE updated
    * source row. Returns (updated = matched source rows, inserted =
    * unmatched source rows); both counters and the duplicate probe come
    * from ONE aggregation action (group source by key, left-join the
    * distinct target keys, fold to a single row) so a MERGE in a loop
    * pays one job, not three. */
  def mergeInto(name: String, source: DataFrame,
      keys: Seq[String]): (Long, Long) = withTableLock(name) {
    require(keys.nonEmpty, "MERGE requires at least one key column")
    val e = registry.getOrElse(name, missing(name))
    keys.foreach { k =>
      if (!e.df.columns.contains(k))
        throw new IllegalArgumentException(
          s"Binder Error: key column $k not in table $name")
    }
    val src = coerceAndValidate(name, e, source)
    val (updated, inserted) = mergeStats(e, src, keys)
    val untouched = e.df.join(src, keys, "left_anti")
    put(name, untouched.unionByName(src))
    (updated, inserted)
  }

  /** Shared MERGE statistics: (matched source rows, unmatched source
    * rows) from ONE aggregation action. When `forbidDupMatches`, a
    * source with duplicate non-NULL keys raises — one target row would
    * otherwise be updated twice (nondeterministically). */
  private def mergeStats(e: TableEntry, src: DataFrame, keys: Seq[String],
      forbidDupMatches: Boolean = true): (Long, Long) = {
    // keysNonNull evaluated AFTER the groupBy: all rows in a group share
    // the key values, so the group-level predicate is well-defined
    val keysNonNull = keys.map(col(_).isNotNull).reduce(_ && _)
    val perKey = src.groupBy(keys.map(src.col): _*)
      .agg(count(lit(1)).as("__n"))
    val tgtKeys = e.df.select(keys.map(e.df.col): _*).distinct()
      .withColumn("__m", lit(1))
    val stats = perKey.join(tgtKeys, keys, "left_outer").agg(
      // duplicate probe: only non-NULL-key groups can collide on a target
      max(when(keysNonNull && col("__n") > 1, col("__n"))).as("__dup"),
      coalesce(sum(when(col("__m").isNotNull, col("__n"))), lit(0L))
        .as("__upd"),
      coalesce(sum(when(col("__m").isNull, col("__n"))), lit(0L))
        .as("__ins")).head()
    if (forbidDupMatches && !stats.isNullAt(0)) {
      // failure path only: re-probe for the offending key value so the
      // error is actionable (mirrors the reference's constraint message)
      val bad = perKey.filter(keysNonNull && col("__n") > 1).head()
      throw new IllegalArgumentException(
        "Constraint Error: MERGE source matches the same target row " +
          s"more than once (key ${bad.toSeq.init.mkString(",")})")
    }
    (stats.getLong(1), stats.getLong(2))
  }

  /** Column-wise MERGE — the `UPDATE SET c = expr, …` / `INSERT (cols)
    * VALUES (…)` SQL form. Matched target rows keep every column NOT
    * named in `updateSet` and take the assignment expressions (evaluated
    * over the joined row; target columns resolve under alias `ta`,
    * source columns under `sa`) for those that are. Unmatched source
    * rows insert via `insertSpec` (column list + value expressions over
    * the source row); unnamed columns fill from their SET DEFAULT
    * expression, NULL otherwise. Either clause may be absent: no
    * MATCHED clause leaves matched target rows untouched, no NOT
    * MATCHED clause drops unmatched source rows. Distributed shape
    * matches [[mergeInto]] — one anti-join for the untouched rows, one
    * equi-join for the updates, unions for assembly, all shuffling on
    * the key columns only; the counters come from the same single
    * aggregation action. Unlike the whole-row form, N target rows
    * sharing a key are EACH updated (standard per-target-row MERGE
    * semantics) rather than collapsed. NOT NULL / ENUM constraint
    * probes run on the changed delta only, before the table is
    * swapped — a rejected MERGE leaves the table untouched. */
  def mergeIntoColumns(name: String, source: DataFrame, keys: Seq[String],
      ta: String, sa: String,
      updateSet: Option[Seq[(String, String)]],
      insertSpec: Option[(Seq[String], Seq[String])]): (Long, Long) =
    mergeIntoColumnsCore(name, source, keys, ta, sa, updateSet,
      insertSpec)._1

  private def mergeIntoColumnsCore(name: String, source: DataFrame,
      keys: Seq[String], ta: String, sa: String,
      updateSet: Option[Seq[(String, String)]],
      insertSpec: Option[(Seq[String], Seq[String])])
      : ((Long, Long), DataFrame) = withTableLock(name) {
    require(keys.nonEmpty, "MERGE requires at least one key column")
    require(updateSet.isDefined || insertSpec.isDefined,
      "MERGE requires at least one WHEN clause")
    val e = registry.getOrElse(name, missing(name))
    // resolve user-written column names against the target schema
    // case-insensitively, like Spark's own identifier resolution
    def canon(c: String): String =
      e.df.columns.find(_.equalsIgnoreCase(c)).getOrElse(
        throw new IllegalArgumentException(
          s"Binder Error: column $c not in table $name"))
    keys.foreach { k =>
      canon(k)
      if (!source.columns.exists(_.equalsIgnoreCase(k)))
        throw new IllegalArgumentException(
          s"Binder Error: key column $k not in MERGE source")
    }
    insertSpec.foreach { case (cols, vals) =>
      if (cols.size != vals.size)
        throw new IllegalArgumentException(
          "Parser Error: MERGE INSERT column list and VALUES arity differ")
    }
    val updMap = updateSet.getOrElse(Nil)
      .map { case (c, ex) => canon(c) -> ex }.toMap
    val insMap = insertSpec.map { case (cols, vals) =>
      cols.map(canon).zip(vals).toMap }.getOrElse(Map.empty)
    // dup-source probe only matters when matched rows are rewritten;
    // an insert-only MERGE legitimately inserts duplicate-key sources
    val (updated, inserted) =
      mergeStats(e, source, keys, forbidDupMatches = updateSet.isDefined)
    val t = e.df.alias(ta)
    val s = source.alias(sa)
    val joinCond = keys.map(k => col(s"$ta.$k") === col(s"$sa.$k"))
      .reduce(_ && _)
    def assigned(c: String, ex: String): Column =
      expr(ex).cast(e.df.schema(c).dataType).as(c)
    val (untouched, updatedRows) = updateSet match {
      case Some(_) =>
        // NULL-key target rows never equi-match — they stay untouched,
        // same as the whole-row path
        (e.df.join(source.select(keys.map(source.col): _*), keys,
          "left_anti"),
          t.join(s, joinCond, "inner").select(e.df.columns.map { c =>
            updMap.get(c).map(assigned(c, _))
              .getOrElse(col(s"$ta.$c").as(c))
          }.toIndexedSeq: _*))
      case None => (e.df, e.df.limit(0))
    }
    val insertedRows = insertSpec match {
      case Some(_) =>
        s.join(t, joinCond, "left_anti").select(e.df.columns.map { c =>
          insMap.get(c).map(assigned(c, _)).getOrElse {
            // omitted columns fill like an explicit-column INSERT:
            // SET DEFAULT expression when registered, NULL otherwise
            columnDefault(name, c).map(expr).getOrElse(lit(null))
              .cast(e.df.schema(c).dataType).as(c)
          }
        }.toIndexedSeq: _*)
      case None => e.df.limit(0)
    }
    // constraint probes on the changed delta only (the untouched rows
    // were valid already); coerceAndValidate also re-canonicalizes any
    // degraded text-carry columns the assignments produced
    val delta = coerceAndValidate(name, e,
      updatedRows.unionByName(insertedRows))
    put(name, untouched.unionByName(delta))
    ((if (updateSet.isDefined) updated else 0L,
      if (insertSpec.isDefined) inserted else 0L), delta)
  }

  def insertValues(name: String, rows: Seq[org.apache.spark.sql.Row]): Unit = {
    val e = registry.getOrElse(name, missing(name))
    insertInto(name, spark.createDataFrame(rows.asJava, e.df.schema))
  }

  /** Exact dedup of a managed table (beyond-reference pipeline verb):
    * keeps one row per key set — hash groupBy underneath (dropDuplicates),
    * one shuffle on the key columns. Returns rows removed. */
  def dedupTable(name: String, keys: Seq[String] = Seq.empty): Long =
      withTableLock(name) {
    val e = registry.getOrElse(name, missing(name))
    val deduped =
      if (keys.isEmpty) e.df.dropDuplicates() else e.df.dropDuplicates(keys)
    val kept = deduped.count()
    val before = e.rows
    put(name, deduped, kept)
    before - kept
  }

  /** Plain `UPDATE t SET c = expr, … [WHERE cond]` as copy-on-write —
    * the week-one DML verb the reference stops short of (its verb set
    * ends at INSERT/DELETE; column assignment exists only inside its
    * MERGE form). Same distributed shape as [[deleteFrom]]: rows where
    * the predicate is TRUE take the assignment expressions (evaluated
    * over the row — `SET price = price * 1.1` reads the old value),
    * rows where it is FALSE or NULL pass through untouched (the SQL
    * tri-state rule). Assignments on the hit slice run through the
    * shared INSERT/MERGE ingress (type coercion + NOT NULL / ENUM
    * probes on the changed delta only), so a rejected UPDATE leaves
    * the table untouched. Nothing ever collects to the driver; the
    * row count is unchanged by construction. Returns rows updated. */
  def updateWhere(name: String, sets: Seq[(String, String)],
      cond: Option[Column]): Long = updateWhereCore(name, sets, cond)._1

  /** UPDATE returning the post-assignment rows ([[updateWhere]]'s delta
    * slice) — what `UPDATE … RETURNING` projects. */
  private[graft] def updateWhereReturning(name: String,
      sets: Seq[(String, String)], cond: Option[Column]): DataFrame =
    updateWhereCore(name, sets, cond)._2

  private def updateWhereCore(name: String, sets: Seq[(String, String)],
      cond: Option[Column]): (Long, DataFrame) = withTableLock(name) {
    require(sets.nonEmpty,
      "Parser Error: UPDATE requires at least one SET assignment")
    val e = registry.getOrElse(name, missing(name))
    def canon(c: String): String =
      e.df.columns.find(_.equalsIgnoreCase(c)).getOrElse(
        throw new IllegalArgumentException(
          s"Binder Error: column $c not in table $name"))
    val setMap = sets.map { case (c, ex) => canon(c) -> ex }.toMap
    if (setMap.size != sets.size)
      throw new IllegalArgumentException(
        "Parser Error: duplicate column in UPDATE SET list")
    // copy-on-write evaluates the predicate twice (hit / !hit slices)
    // and the SET expressions again on the union read: a
    // non-deterministic rand()/uuid() would lose or duplicate rows and
    // desync the returned count from the persisted state — reject it
    sets.foreach { case (c, ex) =>
      requireDeterministic(e.df, expr(ex), s"UPDATE SET $c") }
    cond.foreach(requireDeterministic(e.df, _, "UPDATE WHERE"))
    val hit = cond.map(c => coalesce(c, lit(false))).getOrElse(lit(true))
    val before = e.rowsIfKnown
    val untouched = e.df.filter(!hit)
    val updatedRows = e.df.filter(hit).select(e.df.columns.map { c =>
      setMap.get(c)
        .map(ex => expr(ex).cast(e.df.schema(c).dataType).as(c))
        .getOrElse(col(c))
    }.toIndexedSeq: _*)
    val delta = coerceAndValidate(name, e, updatedRows)
    val n = delta.count()
    put(name, untouched.unionByName(delta), before)
    (n, delta)
  }

  /** Join-form UPDATE — `UPDATE t SET c = expr, … FROM src WHERE cond`
    * (the DuckDB/Postgres spelling users migrating SQL hit right after
    * plain UPDATE). Target rows with a join match take the SET
    * expressions, which may reference source columns (target resolves
    * under the table name, source under `sourceAlias`); unmatched rows
    * pass through untouched. Distributed shape: one join on the
    * condition for the updated slice, one anti-join for the untouched
    * slice, both shuffling on the extracted equi-keys (AQE handles
    * skew); no driver materialization beyond the counters.
    *
    * Deliberate divergence from DuckDB: a target row matching MORE THAN
    * ONE source row raises a Constraint Error instead of updating with
    * an arbitrary match (DuckDB/Postgres document the pick as
    * unpredictable) — same determinism stance as [[mergeIntoColumns]].
    * The probe is a statement-time action over a row-id'd target frame;
    * the id never enters the stored lineage. */
  def updateFrom(name: String, sets: Seq[(String, String)],
      source: DataFrame, sourceAlias: String,
      cond: Option[String]): Long =
    updateFromCore(name, sets, source, sourceAlias, cond)._1

  /** Join-form UPDATE returning the post-assignment target rows — what
    * `UPDATE … FROM … RETURNING` projects (target columns; standard
    * target-row RETURNING scope). */
  private[graft] def updateFromReturning(name: String,
      sets: Seq[(String, String)], source: DataFrame,
      sourceAlias: String, cond: Option[String]): DataFrame =
    updateFromCore(name, sets, source, sourceAlias, cond)._2

  private def updateFromCore(name: String, sets: Seq[(String, String)],
      source: DataFrame, sourceAlias: String,
      cond: Option[String]): (Long, DataFrame) = withTableLock(name) {
    require(sets.nonEmpty,
      "Parser Error: UPDATE requires at least one SET assignment")
    val e = registry.getOrElse(name, missing(name))
    def canon(c: String): String =
      e.df.columns.find(_.equalsIgnoreCase(c)).getOrElse(
        throw new IllegalArgumentException(
          s"Binder Error: column $c not in table $name"))
    val setMap = sets.map { case (c, ex) => canon(c) -> ex }.toMap
    if (setMap.size != sets.size)
      throw new IllegalArgumentException(
        "Parser Error: duplicate column in UPDATE SET list")
    if (sourceAlias.equalsIgnoreCase(name))
      throw new IllegalArgumentException(
        s"Binder Error: UPDATE FROM source alias '$sourceAlias' " +
          "collides with the target table name")
    val t = e.df.alias(name)
    val s = source.alias(sourceAlias)
    val on = cond.map(expr).getOrElse(lit(true))
    // determinism check resolves over the joined shape (SET/WHERE may
    // reference both sides); crossJoin here is analysis-only, lazy
    val probe = t.crossJoin(s)
    cond.foreach(c => requireDeterministic(probe, expr(c), "UPDATE WHERE"))
    sets.foreach { case (c, ex) =>
      requireDeterministic(probe, expr(ex), s"UPDATE SET $c") }
    // multi-match probe: eager, aggregate-only; the row id is discarded
    // with this action (monotonically_increasing_id is stable within
    // the single evaluation, which is all the probe needs)
    val multi = e.df.withColumn("__graft_rid",
        monotonically_increasing_id())
      .alias(name).join(s, on, "inner")
      .groupBy(col("__graft_rid")).agg(count(lit(1)).as("__n"))
      .filter(col("__n") > 1)
    if (!multi.isEmpty)
      throw new IllegalArgumentException(
        "Constraint Error: UPDATE FROM source matches the same target " +
          "row more than once")
    val before = e.rowsIfKnown
    val updatedRows = t.join(s, on, "inner").select(e.df.columns.map { c =>
      setMap.get(c)
        .map(ex => expr(ex).cast(e.df.schema(c).dataType).as(c))
        .getOrElse(col(s"$name.$c").as(c))
    }.toIndexedSeq: _*)
    val untouched = t.join(s, on, "left_anti")
      .select(e.df.columns.map(c => col(s"$name.$c").as(c))
        .toIndexedSeq: _*)
    val delta = coerceAndValidate(name, e, updatedRows)
    val n = delta.count()
    put(name, untouched.unionByName(delta), before)
    (n, delta)
  }

  /** DELETE as predicate inversion — a full-scan copy-on-write rewrite
    * (what Delta/Iceberg do per-file), never a driver-side row collect. */
  def deleteFrom(name: String, cond: Column): Long =
    deleteFromCore(name, cond)._1

  /** DELETE returning the removed rows (the predicate's TRUE slice over
    * the pre-swap lineage) — what `DELETE … RETURNING` projects. */
  private[graft] def deleteFromReturning(name: String,
      cond: Column): DataFrame = deleteFromCore(name, cond)._2

  private def deleteFromCore(name: String,
      cond: Column): (Long, DataFrame) = withTableLock(name) {
    val e = registry.getOrElse(name, missing(name))
    // same double-evaluation hazard as updateWhere
    requireDeterministic(e.df, cond, "DELETE WHERE")
    // SQL DELETE removes only rows where the predicate is TRUE; a row
    // where it evaluates NULL must be KEPT (plain `!cond` would drop it)
    val hit = coalesce(cond, lit(false))
    val remaining = e.df.filter(!hit)
    val deleted = e.df.filter(hit)
    val kept = remaining.count()
    val before = e.rows
    put(name, remaining, kept)
    (before - kept, deleted)
  }

  /** Join-form DELETE — `DELETE FROM t USING src WHERE cond` (the
    * DuckDB/Postgres spelling): target rows with at least one TRUE
    * join match are removed; NULL/false matches keep their rows (SQL
    * tri-state, same as the plain form). Unlike UPDATE FROM there is
    * no multi-match hazard — any number of matches deletes the row
    * once — so the shape is a single anti-join on the condition
    * (shuffling on the extracted equi-keys), copy-on-write swap,
    * nothing driver-side but the counters. */
  def deleteUsing(name: String, source: DataFrame, sourceAlias: String,
      cond: Option[String]): Long =
    deleteUsingCore(name, source, sourceAlias, cond)._1

  /** Join-form DELETE returning the removed target rows (the semi-join
    * complement of the kept anti-join slice, over the pre-swap
    * lineage) — what `DELETE … USING … RETURNING` projects. */
  private[graft] def deleteUsingReturning(name: String,
      source: DataFrame, sourceAlias: String,
      cond: Option[String]): DataFrame =
    deleteUsingCore(name, source, sourceAlias, cond)._2

  private def deleteUsingCore(name: String, source: DataFrame,
      sourceAlias: String,
      cond: Option[String]): (Long, DataFrame) = withTableLock(name) {
    val e = registry.getOrElse(name, missing(name))
    if (sourceAlias.equalsIgnoreCase(name))
      throw new IllegalArgumentException(
        s"Binder Error: DELETE USING source alias '$sourceAlias' " +
          "collides with the target table name")
    val t = e.df.alias(name)
    val s = source.alias(sourceAlias)
    val on = cond.map(expr).getOrElse(lit(true))
    cond.foreach(c =>
      requireDeterministic(t.crossJoin(s), expr(c), "DELETE WHERE"))
    val remaining = t.join(s, on, "left_anti")
      .select(e.df.columns.map(c => col(s"$name.$c").as(c))
        .toIndexedSeq: _*)
    val deleted = t.join(s, on, "left_semi")
      .select(e.df.columns.map(c => col(s"$name.$c").as(c))
        .toIndexedSeq: _*)
    val kept = remaining.count()
    val before = e.rows
    put(name, remaining, kept)
    (before - kept, deleted)
  }

  /** INSERT … ON CONFLICT — the DuckDB upsert spelling, riding the
    * MERGE machinery: `conflictCols` are the merge keys; DO NOTHING
    * inserts only unmatched source rows; DO UPDATE applies the SET
    * list to matched target rows with the incoming row visible under
    * the standard `excluded` alias. Engine-defined divergence,
    * documented: DuckDB requires a UNIQUE constraint on the conflict
    * target; managed tables here carry no uniqueness, so the conflict
    * columns act directly as merge keys (a source row "conflicts" iff
    * a target row matches on them) — same keys, same answer, no
    * constraint catalog required. Returns (updated, inserted). */
  def insertOnConflict(name: String, source: DataFrame,
      conflictCols: Seq[String],
      updateSet: Option[Seq[(String, String)]]): (Long, Long) =
    insertOnConflictCore(name, source, conflictCols, updateSet)._1

  /** Upsert returning the affected rows — DO UPDATE's post-assignment
    * matched rows plus the inserted rows (DuckDB's `ON CONFLICT …
    * RETURNING` scope: rows the statement wrote, not rows it
    * skipped). */
  private[graft] def insertOnConflictReturning(name: String,
      source: DataFrame, conflictCols: Seq[String],
      updateSet: Option[Seq[(String, String)]]): DataFrame =
    insertOnConflictCore(name, source, conflictCols, updateSet)._2

  private def insertOnConflictCore(name: String, source: DataFrame,
      conflictCols: Seq[String],
      updateSet: Option[Seq[(String, String)]])
      : ((Long, Long), DataFrame) = withTableLock(name) {
    // the whole verb runs under the (reentrant) table lock — the arity
    // check and positional alignment below read the schema, and a
    // concurrent ALTER TABLE between them and the merge would misalign
    // the frame (updateFrom/deleteUsing take the same whole-verb lock)
    val doUpdate = updateSet.map(_.toSeq)
    val e = registry.getOrElse(name, missing(name))
    val insertAll = e.df.columns.toSeq
    if (source.columns.length != e.df.columns.length)
      throw new IllegalArgumentException(
        s"Binder Error: INSERT arity ${source.columns.length} does not " +
          s"match table $name (${e.df.columns.length} columns)")
    // positional alignment, like plain INSERT: a VALUES source arrives
    // with synthetic column names, and the merge keys must resolve
    val aligned0 = source.toDF(insertAll: _*)
    // DO NOTHING: a batch may conflict with ITSELF — DuckDB inserts the
    // first row per conflict key and ignores the rest. Keep one row per
    // non-NULL key set in statement order (monotonically_increasing_id
    // is monotone in partition-then-row order, which is the VALUES /
    // source order within the single evaluation this window needs);
    // NULL-key rows never conflict and all pass through. DO UPDATE
    // keeps the full batch: mergeStats' duplicate probe raises there,
    // matching DuckDB's can-not-update-the-same-row-twice rule.
    val aligned = if (updateSet.isDefined) aligned0 else {
      val keyCols = conflictCols.map(k =>
        aligned0.columns.find(_.equalsIgnoreCase(k)).getOrElse(k))
      val anyNull = keyCols.map(aligned0.col(_).isNull).reduce(_ || _)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(keyCols.map(col): _*)
        .orderBy(col("__graft_ord"))
      aligned0.withColumn("__graft_ord", monotonically_increasing_id())
        .withColumn("__graft_rn", row_number().over(w))
        .filter(col("__graft_rn") === 1 || anyNull)
        .drop("__graft_ord", "__graft_rn")
    }
    mergeIntoColumnsCore(name, aligned, conflictCols,
      ta = name, sa = "excluded",
      updateSet = doUpdate,
      insertSpec = Some((insertAll, insertAll.map(c => s"excluded.$c"))))
  }

  // ---- COPY TO / FROM — the DuckDB file-connector verbs ----------------

  /** File formats the COPY verbs accept — DuckDB's core copy functions
    * that map 1:1 onto Spark's built-in writers/readers (the reference
    * loads exactly these via its extension mechanism,
    * test_extension_loading.test). */
  private val CopyFormats = Set("parquet", "csv", "json", "orc")

  /** Resolve the format: explicit FORMAT option wins, else the path
    * extension (DuckDB's inference rule). Unknown names raise the
    * catalog error a DuckDB user expects. */
  private def copyFormat(path: String, opts: Map[String, String]): String = {
    val fmt = opts.get("format").orElse {
      val name = path.substring(path.lastIndexOf('/') + 1)
      val dot = name.lastIndexOf('.')
      if (dot > 0) Some(name.substring(dot + 1).toLowerCase) else None
    }.getOrElse(throw new IllegalArgumentException(
      "Binder Error: COPY needs a FORMAT option or a recognizable " +
        s"file extension on '$path'"))
    if (!CopyFormats(fmt))
      throw new IllegalArgumentException(
        s"""Catalog Error: Copy Function with name "$fmt" does not exist!""")
    fmt
  }

  private def copyOptioned[A](rw: A, fmt: String,
      opts: Map[String, String],
      set: (A, String, String) => A): A = {
    var out = rw
    if (fmt == "csv") {
      // header defaults ON both directions so COPY TO → COPY FROM
      // round-trips without options (documented divergence: DuckDB
      // historically defaulted headerless CSV)
      out = set(out, "header", opts.getOrElse("header", "true"))
      opts.get("delimiter").foreach(d => out = set(out, "sep", d))
    }
    out
  }

  /** `COPY <table|(query)> TO '<path>' (opts)`: a DISTRIBUTED Spark
    * write — every executor writes its partitions as part files under
    * `path` (the lakehouse layout; DuckDB's single-file output does not
    * survive 100 TB, and Spark's readers — and [[copyFrom]] — consume
    * the directory transparently). Returns rows copied, counted by a
    * plan observation on the same single pass, not a second scan. */
  def copyTo(df: DataFrame, path: String,
      opts: Map[String, String]): Long = {
    val fmt = copyFormat(path, opts)
    val obs = org.apache.spark.sql.Observation()
    val w0 = copyOptioned(
      df.observe(obs, count(lit(1)).as("n")).write.mode("overwrite"),
      fmt, opts,
      (w: org.apache.spark.sql.DataFrameWriter[org.apache.spark.sql.Row],
        k: String, v: String) => w.option(k, v))
    // PARTITION_BY → the Hive directory layout (q137's partitioned
    // sink): one subdirectory per key value, readable with partition
    // pruning by Spark AND DuckDB's hive_partitioning reader
    val w = opts.get("partition_by") match {
      case Some(cols) => w0.partitionBy(cols.split(",").toIndexedSeq: _*)
      case None => w0
    }
    w.format(fmt).save(path)
    obs.get("n").asInstanceOf[Long]
  }

  /** `COPY <table> FROM '<path>' (opts)`: a distributed read of the
    * file/directory under the TARGET's schema (DuckDB also binds the
    * payload to the table's columns), appended through the same
    * [[insertInto]] ingress as any INSERT — coercions and NOT NULL /
    * ENUM probes included, so a bad file rejects atomically. Returns
    * rows appended. */
  def copyFrom(name: String, path: String,
      opts: Map[String, String]): Long = withTableLock(name) {
    val e = registry.getOrElse(name, missing(name))
    val fmt = copyFormat(path, opts)
    val auto = opts.get("auto_detect").contains("true")
    val base =
      if (auto) {
        // AUTO_DETECT (DuckDB's sniffing): let the reader infer the
        // schema instead of binding the target's — the INSERT ingress
        // coerces types afterwards
        if (fmt == "csv") spark.read.option("inferSchema", "true")
        else spark.read
      } else spark.read.schema(e.df.schema)
    val r = copyOptioned(base, fmt, opts,
      (r: org.apache.spark.sql.DataFrameReader, k: String, v: String) =>
        r.option(k, v))
    val df0 = r.format(fmt).load(path)
    // detected columns align BY NAME when they cover the target
    // (JSON inference returns fields alphabetically — positional
    // alignment would scramble them); headerless/renamed payloads fall
    // back to positional, where the ingress arity check guards
    val df = if (auto) {
      val tcols = e.df.columns
      if (tcols.forall(c => df0.columns.exists(_.equalsIgnoreCase(c))))
        df0.select(tcols.map(c =>
          df0.col(df0.columns.find(_.equalsIgnoreCase(c)).get))
          .toIndexedSeq: _*)
      else df0
    } else df0
    val n = df.count()
    insertInto(name, df)
    n
  }

  /** INSERT OR REPLACE rides the whole-row MERGE, whose documented
    * N-to-1 collapse on duplicate TARGET key values would silently
    * shrink the table; DuckDB refuses the shorthand absent a UNIQUE
    * constraint. The index registry is advisory (no uniqueness is
    * enforced on managed tables), so the route probes the target for
    * duplicate key values first and raises a Constraint Error instead
    * of collapsing. One aggregate-only action on the conflict columns;
    * NULL keys never conflict and are exempt. */
  private[graft] def requireUniqueKeys(name: String, keys: Seq[String],
      ctx: String): Unit = {
    val e = registry.getOrElse(name, missing(name))
    val keysNonNull = keys.map(e.df.col(_).isNotNull).reduce(_ && _)
    val dup = e.df.filter(keysNonNull).groupBy(keys.map(e.df.col): _*)
      .agg(count(lit(1)).as("__n")).filter(col("__n") > 1).head(1)
    if (dup.nonEmpty)
      throw new IllegalArgumentException(
        s"Constraint Error: $ctx needs unique values on its inferred " +
          s"conflict target $name(${keys.mkString(",")}); found " +
          s"duplicate key (${dup.head.toSeq.init.mkString(",")}) — " +
          "the whole-row replace would collapse those rows into one")
  }
}
