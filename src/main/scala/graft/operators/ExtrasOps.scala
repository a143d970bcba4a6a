package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.t

/** Remaining parity batch: ENUM declaration-order semantics over real
  * data, cross-source canonical dedup, and the full window-function
  * suite. */
object ExtrasOps {

  /** ENUM declaration-order comparison (enum_type_support.test:62-81):
    * the engine maps an enum column to its declaration rank
    * (Engine.enumOrd / array_position) for ORDER BY / MIN / MAX. Both
    * engines evaluate the same rank mapping — DuckDB's `CREATE TYPE`
    * cannot appear in a single oracle statement, and its *anonymous*
    * enums sort lexically, so the rank formulation is the portable one. */
  val enumOrder: NamedQuery = NamedQuery("q71_enum_order",
    Some("""SELECT lang, count(*) AS n,
           |CAST(list_position(['zh','en','de','fr','es'], lang) AS BIGINT)
           |  AS lang_rank
           |FROM documents GROUP BY lang ORDER BY lang_rank""".stripMargin),
    (s, d) => {
      val rank = array_position(
        lit(Array("zh", "en", "de", "fr", "es")), col("lang"))
      t(s, d, "documents").groupBy("lang")
        .agg(count(lit(1)).as("n"), rank.cast("bigint").as("lang_rank"))
        .orderBy("lang_rank")
    })

  /** Cross-source canonical dedup: per duplicate group, keep the doc from
    * the lexically-first source (argmin) — the "source priority" rule a
    * multi-crawl pipeline applies after near-dup clustering. */
  val crossSource: NamedQuery = NamedQuery("q72_dedup_cross_source",
    Some("""SELECT lang, n_chars,
           |min_by(doc_id, source || '#' || CAST(doc_id AS VARCHAR)) AS keep_id,
           |count(*) AS n_copies,
           |count(DISTINCT source) AS n_sources
           |FROM documents GROUP BY lang, n_chars""".stripMargin),
    (s, d) => t(s, d, "documents").groupBy("lang", "n_chars").agg(
      min_by(col("doc_id"),
        concat(col("source"), lit("#"), col("doc_id").cast("string")))
        .as("keep_id"),
      count(lit(1)).as("n_copies"),
      countDistinct(col("source")).as("n_sources")))

  /** Equi-width histogram: bucket arithmetic in DOUBLE (identical in
    * both engines; DuckDB v1.0 has no width_bucket), counts + per-bucket
    * bounds — the profiling aggregation a data-quality pass runs. */
  val histogram: NamedQuery = {
    val q =
      """SELECT CAST(least(greatest(
        |  CAST(floor((CAST(l_extendedprice AS DOUBLE) - 900.0) / 13000.0)
        |    AS INTEGER), 0), 7) AS INTEGER) AS bucket,
        |count(*) AS n,
        |round(CAST(min(l_extendedprice) AS DOUBLE), 2) AS lo,
        |round(CAST(max(l_extendedprice) AS DOUBLE), 2) AS hi
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin
    NamedQuery("q113_histogram", Some(q), (s, d) => {
      graft.Tables.t(s, d, "lineitem").createOrReplaceTempView("lineitem")
      s.sql(q)
    })
  }

  /** Higher-order list functions: transform / filter / fold evaluate the
    * same lambdas in both engines (DuckDB list_* ↔ Spark HOFs). */
  val lambdaFuncs: NamedQuery = NamedQuery("q114_lambda_funcs",
    Some("""SELECT id,
           |coalesce(array_to_string(list_transform(xs, x -> x * 2), ','), '')
           |  AS doubled,
           |coalesce(array_to_string(list_filter(xs, x -> x % 2 = 0), ','), '')
           |  AS evens,
           |coalesce(CAST(list_sum(list_transform(xs, x -> x * x))
           |  AS BIGINT), 0) AS sum_sq
           |FROM (VALUES (1, [1, 2, 3]), (2, [4, 5]), (3, []::INTEGER[]))
           |  v(id, xs) ORDER BY id""".stripMargin),
    (s, _) => s.sql(
      """SELECT id,
        |array_join(transform(xs, x -> x * 2), ',') AS doubled,
        |array_join(filter(xs, x -> x % 2 = 0), ',') AS evens,
        |coalesce(CAST(aggregate(transform(xs, x -> x * x), 0L,
        |  (acc, x) -> acc + x) AS BIGINT), 0) AS sum_sq
        |FROM VALUES (1, array(1, 2, 3)), (2, array(4, 5)),
        |  (3, CAST(array() AS ARRAY<INT>)) AS v(id, xs)
        |ORDER BY id""".stripMargin))

  /** Recursive CTE (Spark 4.1 WITH RECURSIVE ↔ DuckDB): generate the
    * month series spanning the order history recursively, then left-join
    * order counts per month — identical SQL runs on both engines. */
  val recursiveCte: NamedQuery = {
    val q =
      """WITH RECURSIVE months(m) AS (
        |  SELECT DATE '1995-01-01'
        |  UNION ALL
        |  SELECT CAST(m + INTERVAL '1' MONTH AS DATE) FROM months
        |  WHERE m < DATE '2001-12-01')
        |SELECT m, count(o_orderkey) AS n
        |FROM months LEFT JOIN orders
        |  ON CAST(date_trunc('month', o_orderdate) AS DATE) = m
        |GROUP BY m ORDER BY m""".stripMargin
    NamedQuery("q115_recursive_cte", Some(q), (s, d) => {
      graft.Tables.t(s, d, "orders").createOrReplaceTempView("orders")
      s.sql(q)
    })
  }

  /** Time-range window frame (RANGE BETWEEN INTERVAL … PRECEDING):
    * rolling 1-hour per-user event counts — tie-safe (RANGE includes
    * peers) and identical SQL on both engines. */
  val rangeFrame: NamedQuery = {
    val q =
      """SELECT event_id, user_id,
        |count(*) OVER (PARTITION BY user_id ORDER BY ts
        |  RANGE BETWEEN INTERVAL '1' HOUR PRECEDING AND CURRENT ROW)
        |  AS n_1h,
        |round(sum(value) OVER (PARTITION BY user_id ORDER BY ts
        |  RANGE BETWEEN INTERVAL '1' HOUR PRECEDING AND CURRENT ROW), 2)
        |  AS sum_1h
        |FROM events WHERE user_id < 10
        |ORDER BY user_id, event_id""".stripMargin
    NamedQuery("q116_range_frame", Some(q), (s, d) => {
      graft.Tables.t(s, d, "events").createOrReplaceTempView("events")
      s.sql(q)
    })
  }

  /** LATERAL correlated subquery — top-2 orders per customer: the
    * per-row dependent join both engines plan natively. */
  val lateralJoin: NamedQuery = {
    val q =
      """SELECT c_custkey, o.o_orderkey,
        |round(CAST(o.o_totalprice AS DOUBLE), 2) AS price
        |FROM customer c,
        |LATERAL (SELECT o_orderkey, o_totalprice FROM orders
        |         WHERE o_custkey = c_custkey
        |         ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
        |WHERE c_custkey < 50
        |ORDER BY c_custkey, price DESC, o_orderkey""".stripMargin
    NamedQuery("q117_lateral", Some(q), (s, d) => {
      graft.Tables.t(s, d, "customer").createOrReplaceTempView("customer")
      graft.Tables.t(s, d, "orders").createOrReplaceTempView("orders")
      s.sql(q)
    })
  }

  /** Full window-function battery over a unique ordering key. */
  val windowSuite: NamedQuery = NamedQuery("q73_window_suite",
    Some("""SELECT o_custkey, o_orderkey,
           |lag(o_orderkey) OVER w AS prev_ok,
           |lead(o_orderkey) OVER w AS next_ok,
           |first_value(o_orderkey) OVER w AS first_ok,
           |dense_rank() OVER w AS dr,
           |ntile(4) OVER w AS nt,
           |round(percent_rank() OVER w, 6) AS pr,
           |round(cume_dist() OVER w, 6) AS cd
           |FROM orders WHERE o_custkey < 50
           |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey)""".stripMargin),
    (s, d) => {
      val w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
      t(s, d, "orders").filter(col("o_custkey") < 50).select(
        col("o_custkey"), col("o_orderkey"),
        lag("o_orderkey", 1).over(w).as("prev_ok"),
        lead("o_orderkey", 1).over(w).as("next_ok"),
        first("o_orderkey").over(w).as("first_ok"),
        dense_rank().over(w).cast("bigint").as("dr"),
        ntile(4).over(w).cast("bigint").as("nt"),
        round(percent_rank().over(w), 6).as("pr"),
        round(cume_dist().over(w), 6).as("cd"))
    })

  /** List NULL semantics (list_type_support.test: empty lists, NULL
    * lists, NULL elements): len/size, 1-based indexing (try_element_at —
    * ANSI mode errors on out-of-bound where DuckDB yields NULL),
    * list_contains — all NULL-propagating identically. */
  val listNulls: NamedQuery = NamedQuery("q74_list_nulls",
    // has1 cast to INT on both sides: pandas renders a nullable Spark
    // boolean as object None but a nullable DuckDB boolean as float NaN
    Some("""SELECT id, len(x) AS n, x[1] AS first_e,
           |CAST(list_contains(x, 1) AS INTEGER) AS has1
           |FROM (VALUES (1, [1, NULL, 3]), (2, []), (3, NULL), (4, [4, 5]))
           |  AS t(id, x)""".stripMargin),
    (s, _) => s.sql(
      """SELECT id, size(x) AS n, try_element_at(x, 1) AS first_e,
        |CAST(array_contains(x, 1) AS INT) AS has1
        |FROM VALUES (1, array(1, CAST(NULL AS INT), 3)), (2, array()),
        |            (3, CAST(NULL AS ARRAY<INT>)), (4, array(4, 5))
        |  AS t(id, x)""".stripMargin))

  /** CUBE — all grouping combinations (completes the ROLLUP/GROUPING
    * SETS family). */
  val cube: NamedQuery = {
    val q = """SELECT l_returnflag, l_linestatus,
              |CAST(grouping(l_returnflag) AS BIGINT) AS g_f,
              |CAST(grouping(l_linestatus) AS BIGINT) AS g_s,
              |count(*) AS n
              |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)""".stripMargin
    NamedQuery("q86_cube", Some(q), (s, d) => {
      graft.Tables.t(s, d, "lineitem").createOrReplaceTempView("lineitem")
      s.sql(q)
    })
  }

  /** Multiset set-ops: EXCEPT ALL / INTERSECT ALL keep duplicates. */
  val setopsAll: NamedQuery = {
    val q = """SELECT 'except' AS op, ok FROM (
              |  SELECT o_orderkey AS ok FROM orders
              |  EXCEPT ALL SELECT l_orderkey AS ok FROM lineitem)
              |UNION ALL
              |SELECT 'intersect' AS op, ok FROM (
              |  SELECT o_orderkey AS ok FROM orders
              |  INTERSECT ALL SELECT l_orderkey AS ok FROM lineitem)""".stripMargin
    NamedQuery("q87_setops_all", Some(q), (s, d) => {
      Seq("orders", "lineitem").foreach(n =>
        graft.Tables.t(s, d, n).createOrReplaceTempView(n))
      s.sql(q)
    })
  }

  /** Semi-structured extraction from the events JSON props column. */
  val jsonExtract: NamedQuery = NamedQuery("q88_json_extract",
    Some("""SELECT event_type,
           |count(*) AS n,
           |CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
           |  AS BIGINT) AS sum_k,
           |CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT))
           |  AS BIGINT) AS max_k
           |FROM events GROUP BY event_type""".stripMargin),
    (s, d) => {
      val k = get_json_object(col("props"), "$.k").cast("bigint")
      graft.Tables.t(s, d, "events").groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum(k).as("sum_k"), max(k).as("max_k"))
    })

  /** Aggregate-to-list (DuckDB list()/Spark collect_list), canonicalized
    * as a sorted CSV of ints so the comparator sees plain strings. */
  val arrayAgg: NamedQuery = NamedQuery("q89_array_agg",
    Some("""SELECT l_orderkey,
           |array_to_string(list_sort(list(l_linenumber)), ',') AS line_nums,
           |count(*) AS n
           |FROM lineitem WHERE l_orderkey <= 200
           |GROUP BY l_orderkey""".stripMargin),
    (s, d) => t(s, d, "lineitem").filter(col("l_orderkey") <= 200)
      .groupBy("l_orderkey")
      .agg(
        array_join(sort_array(collect_list(col("l_linenumber"))), ",")
          .as("line_nums"),
        count(lit(1)).as("n")))

  /** ANSI aggregate FILTER clause — identical SQL both engines. */
  val filterClause: NamedQuery = {
    val q = """SELECT l_returnflag,
              |count(*) AS n_all,
              |count(*) FILTER (WHERE l_quantity > 25) AS n_big,
              |round(sum(l_extendedprice) FILTER (WHERE l_discount > 0.05), 2)
              |  AS disc_price,
              |round(avg(l_tax) FILTER (WHERE l_linestatus = 'F'), 4) AS avg_tax_f
              |FROM lineitem GROUP BY l_returnflag""".stripMargin
    NamedQuery("q90_filter_clause", Some(q), (s, d) => {
      graft.Tables.t(s, d, "lineitem").createOrReplaceTempView("lineitem")
      s.sql(q)
    })
  }

  def defs: Seq[NamedQuery] =
    Seq(enumOrder, crossSource, windowSuite, listNulls, cube, setopsAll,
      jsonExtract, arrayAgg, filterClause, histogram, lambdaFuncs,
      recursiveCte, rangeFrame, lateralJoin)
}
