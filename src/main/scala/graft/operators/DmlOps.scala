package graft.operators

import org.apache.spark.sql.functions._

import graft.{Engine, Tables}

/** DML surface exercised end-to-end through the [[graft.Engine]] catalog:
  * CREATE TABLE AS → INSERT (from SELECT) → DELETE (predicate rewrite) →
  * read back. The oracle expresses the same final state as pure SQL over
  * the base table, so the engine's copy-on-write DML is hash-checked
  * against DuckDB (ref semantics: distributed_insert.cpp:26-100,
  * distributed_delete.cpp:27-126). */
object DmlOps {

  val dmlRoundtrip: NamedQuery = NamedQuery("q32_dml_roundtrip",
    Some("""SELECT l_orderkey, l_linenumber, round(l_quantity, 2) AS qty
           |FROM lineitem WHERE l_orderkey <= 200 AND NOT (round(l_quantity, 2) < 5)
           |UNION ALL
           |SELECT l_orderkey, l_linenumber, round(l_quantity, 2) AS qty
           |FROM lineitem WHERE l_orderkey <= 50""".stripMargin),
    (s, d) => {
      val engine = Engine(s)
      val name = "graft_dml_roundtrip"
      engine.dropTable(name, ifExists = true)
      val base = Tables.t(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          round(col("l_quantity"), 2).as("qty"))
      engine.createTableAs(name, base.filter(col("l_orderkey") <= 200))
      engine.deleteFrom(name, col("qty") < 5)
      engine.insertInto(name, base.filter(col("l_orderkey") <= 50))
      engine.table(name)
    })

  /** Plain SQL `UPDATE … SET … WHERE …` end-to-end through the router
    * (the week-one verb the reference's INSERT/DELETE set omits): build
    * a managed table, UPDATE a slice — an expression assignment reading
    * the old value plus a constant assignment — and read back. The
    * oracle recomputes the final state as a pure CASE projection over
    * the base table, so the copy-on-write update (hit slice rewritten,
    * miss slice untouched, row count preserved) is hash-checked against
    * DuckDB. */
  val updateRoundtrip: NamedQuery = NamedQuery("q187_update_roundtrip",
    Some("""SELECT l_orderkey, l_linenumber,
           |CASE WHEN l_orderkey <= 100 THEN round(l_quantity, 2) + 1
           |     ELSE round(l_quantity, 2) END AS qty,
           |CASE WHEN l_orderkey <= 100 THEN 'bumped'
           |     ELSE l_returnflag END AS f
           |FROM lineitem WHERE l_orderkey <= 300""".stripMargin),
    (s, d) => {
      val engine = Engine(s)
      val name = "graft_update_roundtrip"
      engine.dropTable(name, ifExists = true)
      engine.createTableAs(name, Tables.t(s, d, "lineitem")
        .filter(col("l_orderkey") <= 300)
        .select(col("l_orderkey"), col("l_linenumber"),
          round(col("l_quantity"), 2).as("qty"),
          col("l_returnflag").as("f")))
      engine.sql(
        s"UPDATE $name SET qty = qty + 1, f = 'bumped' " +
          "WHERE l_orderkey <= 100")
      engine.table(name)
    })

  /** Join-form UPDATE end-to-end ([[graft.EngineDml.updateFrom]]):
    * register a lineitem slice and a high-price orders slice as managed
    * tables, run `UPDATE … SET … FROM src WHERE …` where one SET
    * expression reads a SOURCE column, and return the target. The
    * oracle replays the semantics as a LEFT JOIN CASE rewrite in
    * DuckDB — matched rows take the assignments (including the
    * source-column one), unmatched rows pass through — so the
    * hash-check proves both slices and the source-expression binding.
    * o_orderkey is unique, so the multi-match guard stays quiet. */
  val updateFromRoundtrip: NamedQuery = NamedQuery("q191_update_from",
    Some("""SELECT l.l_orderkey, l.l_linenumber,
           |CASE WHEN o.o_orderkey IS NOT NULL
           |     THEN round(l.l_quantity, 2) + 10
           |     ELSE round(l.l_quantity, 2) END AS qty,
           |CASE WHEN o.o_orderkey IS NOT NULL
           |     THEN substr(o.o_orderpriority, 1, 1)
           |     ELSE l.l_returnflag END AS f
           |FROM lineitem l LEFT JOIN
           |  (SELECT * FROM orders WHERE o_totalprice > 150000) o
           |  ON l.l_orderkey = o.o_orderkey
           |WHERE l.l_orderkey <= 300""".stripMargin),
    (s, d) => {
      val engine = Engine(s)
      val name = "graft_updfrom_tgt"
      val src = "graft_updfrom_src"
      engine.dropTable(name, ifExists = true)
      engine.dropTable(src, ifExists = true)
      engine.createTableAs(name, Tables.t(s, d, "lineitem")
        .filter(col("l_orderkey") <= 300)
        .select(col("l_orderkey"), col("l_linenumber"),
          round(col("l_quantity"), 2).as("qty"),
          col("l_returnflag").as("f")))
      engine.createTableAs(src, Tables.t(s, d, "orders")
        .filter(col("o_totalprice") > 150000)
        .select(col("o_orderkey"), col("o_orderpriority")))
      engine.sql(
        s"""UPDATE $name SET qty = qty + 10,
           |f = substring($src.o_orderpriority, 1, 1)
           |FROM $src WHERE $name.l_orderkey = $src.o_orderkey"""
          .stripMargin)
      engine.table(name)
    })

  /** Materialized-aggregate rewrite end-to-end: register lineitem as a
    * managed table, materialize (returnflag, linestatus)-grouped
    * partials for four measures, and run a covered SQL aggregate — the
    * engine rewrites it to re-aggregate the MV
    * ([[graft.plans.MatViewRewrite]]; PlanQualitySpec pins the plan:
    * the rewritten query scans the MV artifact, not the base). The
    * oracle computes the same aggregate from the raw table, so the
    * hash-check proves the partial re-aggregation (sum-of-sums,
    * min-of-mins, avg = Σsum/Σcnt, count(*) = Σn_rows) is exact. */
  val matviewAgg: NamedQuery = NamedQuery("q159_matview_agg",
    Some("""SELECT l_returnflag, l_linestatus,
           |round(sum(l_quantity), 2) AS sum_qty,
           |round(avg(l_extendedprice), 4) AS avg_price,
           |round(min(l_discount), 2) AS min_disc,
           |round(max(l_tax), 2) AS max_tax,
           |count(*) AS n
           |FROM lineitem WHERE l_returnflag IN ('A', 'R')
           |GROUP BY l_returnflag, l_linestatus""".stripMargin),
    (s, d) => {
      val engine = Engine(s)
      val base = "graft_mv_lineitem"
      val mv = "graft_mv_li_agg"
      engine.dropTable(mv, ifExists = true)
      engine.dropTable(base, ifExists = true)
      engine.createTableAs(base, Tables.t(s, d, "lineitem"))
      // the SQL spelling (routed to createMaterializedAggregate), so
      // the oracle gate exercises the CREATE MATERIALIZED VIEW path
      engine.sql(
        s"""CREATE MATERIALIZED VIEW $mv AS SELECT
           |l_returnflag, l_linestatus,
           |sum(l_quantity) AS s1, sum(l_extendedprice) AS s2,
           |sum(l_discount) AS s3, sum(l_tax) AS s4, count(*) AS n
           |FROM $base GROUP BY l_returnflag, l_linestatus""".stripMargin)
      engine.sql(
        """SELECT l_returnflag, l_linestatus,
          |round(sum(l_quantity), 2) AS sum_qty,
          |round(avg(l_extendedprice), 4) AS avg_price,
          |round(min(l_discount), 2) AS min_disc,
          |round(max(l_tax), 2) AS max_tax,
          |count(*) AS n
          |FROM graft_mv_lineitem WHERE l_returnflag IN ('A', 'R')
          |GROUP BY l_returnflag, l_linestatus""".stripMargin)
    })

  /** Incremental MV refresh end-to-end: materialize the partials, append
    * a delta to the base (so the MV goes stale), REFRESH — which must
    * take the INCREMENTAL path (delta partials merged into the stored
    * artifact, corpus never rescanned) — and run a covered aggregate
    * that the refreshed MV serves. The oracle computes the same
    * aggregate over base ∪ delta in DuckDB, so the hash-check proves
    * the delta merge (sum+sum, min-of-mins, Σcnt, Σn_rows) is exact. */
  val matviewRefresh: NamedQuery = NamedQuery("q160_matview_refresh",
    Some("""SELECT l_returnflag, l_linestatus,
           |round(sum(l_quantity), 2) AS sum_qty,
           |round(avg(l_extendedprice), 4) AS avg_price,
           |round(min(l_discount), 2) AS min_disc,
           |round(max(l_tax), 2) AS max_tax,
           |count(*) AS n
           |FROM (SELECT * FROM lineitem UNION ALL
           |      SELECT * FROM lineitem WHERE l_orderkey <= 100) u
           |GROUP BY l_returnflag, l_linestatus""".stripMargin),
    (s, d) => {
      val engine = Engine(s)
      val base = "graft_mvr_lineitem"
      val mv = "graft_mvr_li_agg"
      engine.dropTable(mv, ifExists = true)
      engine.dropTable(base, ifExists = true)
      val li = Tables.t(s, d, "lineitem")
      engine.createTableAs(base, li)
      engine.sql(
        s"""CREATE MATERIALIZED VIEW $mv AS SELECT
           |l_returnflag, l_linestatus,
           |sum(l_quantity) AS s1, sum(l_extendedprice) AS s2,
           |sum(l_discount) AS s3, sum(l_tax) AS s4, count(*) AS n
           |FROM $base GROUP BY l_returnflag, l_linestatus""".stripMargin)
      engine.insertInto(base, li.filter(col("l_orderkey") <= 100))
      val mode = engine.refreshMaterializedAggregate(mv)
      require(mode == "incremental",
        s"expected the incremental refresh path, got $mode")
      val out = engine.sql(
        s"""SELECT l_returnflag, l_linestatus,
           |round(sum(l_quantity), 2) AS sum_qty,
           |round(avg(l_extendedprice), 4) AS avg_price,
           |round(min(l_discount), 2) AS min_disc,
           |round(max(l_tax), 2) AS max_tax,
           |count(*) AS n
           |FROM $base GROUP BY l_returnflag, l_linestatus""".stripMargin)
      val plan = org.apache.spark.sql.classic.ClassicConversions
        .castToImpl(out).queryExecution.optimizedPlan.toString()
      require(plan.contains("sum_l_quantity"),
        "covered aggregate not served by the refreshed MV")
      out
    })

  def defs: Seq[NamedQuery] =
    Seq(dmlRoundtrip, updateRoundtrip, updateFromRoundtrip, matviewAgg,
      matviewRefresh)
}
