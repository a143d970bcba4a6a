package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t

/** Additional TPC-H-shaped queries (adapted to the synthetic schema's
  * columns) — the harder SQL surface: EXISTS/NOT EXISTS with
  * correlation, IN over grouped HAVING, left-join distributions,
  * NOT IN subqueries, scalar-subquery thresholds. All oracle-checked. */
object TpchOps {

  private def viewsSql(q: String, tables: String*): (SparkSession, String) => DataFrame =
    (s, d) => {
      tables.foreach(n => t(s, d, n).createOrReplaceTempView(n))
      s.sql(q)
    }

  /** Q4 shape: order-priority count for orders with at least one
    * qualifying lineitem (correlated EXISTS). */
  private val q4ish: NamedQuery = {
    val q = """SELECT o_orderpriority, count(*) AS order_count
              |FROM orders
              |WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
              |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
              |  AND EXISTS (SELECT 1 FROM lineitem
              |              WHERE l_orderkey = o_orderkey
              |                AND l_shipdate > o_orderdate)
              |GROUP BY o_orderpriority""".stripMargin
    NamedQuery("q80_tpch_q4", Some(q), viewsSql(q, "orders", "lineitem"))
  }

  /** Q10 shape: top returned-revenue customers. */
  private val q10ish: NamedQuery = {
    val q = """SELECT c_custkey, c_name,
              |round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
              |n_name
              |FROM customer
              |JOIN orders ON c_custkey = o_custkey
              |JOIN lineitem ON l_orderkey = o_orderkey
              |JOIN nation ON c_nationkey = n_nationkey
              |WHERE l_returnflag = 'R'
              |GROUP BY c_custkey, c_name, n_name
              |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin
    NamedQuery("q81_tpch_q10", Some(q),
      viewsSql(q, "customer", "orders", "lineitem", "nation"))
  }

  /** Q13 shape: distribution of customers by order count (left join →
    * count → histogram). */
  private val q13ish: NamedQuery = {
    val q = """SELECT c_count, count(*) AS custdist FROM (
              |  SELECT c_custkey, count(o_orderkey) AS c_count
              |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
              |  GROUP BY c_custkey) sub
              |GROUP BY c_count""".stripMargin
    NamedQuery("q82_tpch_q13", Some(q), viewsSql(q, "customer", "orders"))
  }

  /** Q16 shape: part/brand supplier counts excluding a NOT IN set. */
  private val q16ish: NamedQuery = {
    val q = """SELECT p_brand, p_type, count(DISTINCT l_suppkey) AS supplier_cnt
              |FROM lineitem JOIN part ON l_partkey = p_partkey
              |WHERE p_size >= 20
              |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
              |                        WHERE s_acctbal < 0)
              |GROUP BY p_brand, p_type""".stripMargin
    NamedQuery("q83_tpch_q16", Some(q),
      viewsSql(q, "lineitem", "part", "supplier"))
  }

  /** Q18 shape: large-volume orders via IN over a grouped HAVING. */
  private val q18ish: NamedQuery = {
    val q = """SELECT o_orderkey, round(o_totalprice, 2) AS price,
              |round(sum(l_quantity), 2) AS total_qty
              |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
              |WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
              |                     GROUP BY l_orderkey
              |                     HAVING sum(l_quantity) > 150)
              |GROUP BY o_orderkey, o_totalprice
              |ORDER BY total_qty DESC, o_orderkey LIMIT 20""".stripMargin
    NamedQuery("q84_tpch_q18", Some(q), viewsSql(q, "orders", "lineitem"))
  }

  /** Q22 shape: customers above the positive-balance average with no
    * orders (scalar subquery + NOT EXISTS). */
  private val q22ish: NamedQuery = {
    val q = """SELECT c_mktsegment, count(*) AS numcust,
              |round(sum(c_acctbal), 2) AS totacctbal
              |FROM customer
              |WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer
              |                   WHERE c_acctbal > 0)
              |  AND NOT EXISTS (SELECT 1 FROM orders
              |                  WHERE o_custkey = c_custkey
              |                    AND o_totalprice > 400000)
              |GROUP BY c_mktsegment""".stripMargin
    NamedQuery("q85_tpch_q22", Some(q), viewsSql(q, "customer", "orders"))
  }

  /** Q7 shape: bilateral shipping volume between two nations by year —
    * the double-nation-join plan where both nation dims broadcast. */
  private val q7ish: NamedQuery = {
    val q = """SELECT supp_nation, cust_nation, l_year,
              |round(sum(volume), 2) AS revenue
              |FROM (
              |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
              |         CAST(extract(year FROM l_shipdate) AS BIGINT) AS l_year,
              |         l_extendedprice * (1 - l_discount) AS volume
              |  FROM supplier
              |  JOIN lineitem ON s_suppkey = l_suppkey
              |  JOIN orders ON o_orderkey = l_orderkey
              |  JOIN customer ON c_custkey = o_custkey
              |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
              |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
              |  WHERE n1.n_name IN ('NATION_1','NATION_2','NATION_3','NATION_4')
              |    AND n2.n_name IN ('NATION_1','NATION_2','NATION_3','NATION_4')
              |    AND n1.n_name <> n2.n_name
              |    AND l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
              |                       AND TIMESTAMP '1997-12-31 00:00:00'
              |) shipping
              |GROUP BY supp_nation, cust_nation, l_year
              |ORDER BY supp_nation, cust_nation, l_year""".stripMargin
    NamedQuery("q101_tpch_q7", Some(q),
      viewsSql(q, "supplier", "lineitem", "orders", "customer", "nation"))
  }

  /** Q8 shape: one nation's market share inside a region for one part
    * type (8-table join; the share division runs in DOUBLE so both
    * engines agree bit-for-bit after round). */
  private val q8ish: NamedQuery = {
    val q = """SELECT o_year,
              |round(sum(CASE WHEN nation = 'NATION_1' THEN volume ELSE 0 END)
              |  / sum(volume), 4) AS mkt_share
              |FROM (
              |  SELECT CAST(extract(year FROM o_orderdate) AS BIGINT) AS o_year,
              |         CAST(l_extendedprice * (1 - l_discount) AS DOUBLE) AS volume,
              |         n2.n_name AS nation
              |  FROM part
              |  JOIN lineitem ON p_partkey = l_partkey
              |  JOIN supplier ON s_suppkey = l_suppkey
              |  JOIN orders ON l_orderkey = o_orderkey
              |  JOIN customer ON o_custkey = c_custkey
              |  JOIN nation n1 ON c_nationkey = n1.n_nationkey
              |  JOIN region ON n1.n_regionkey = r_regionkey
              |  JOIN nation n2 ON s_nationkey = n2.n_nationkey
              |  WHERE r_name = 'ASIA' AND p_type = 'PROMO'
              |    AND o_orderdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
              |                        AND TIMESTAMP '1997-12-31 00:00:00'
              |) all_nations GROUP BY o_year ORDER BY o_year""".stripMargin
    NamedQuery("q102_tpch_q8", Some(q), viewsSql(q, "part", "lineitem",
      "supplier", "orders", "customer", "nation", "region"))
  }

  /** Q9 shape: profit by supplier nation and year (cost term adapted to
    * p_retailprice — the synthetic schema has no partsupp). */
  private val q9ish: NamedQuery = {
    val q = """SELECT nation, o_year, round(sum(amount), 2) AS sum_profit
              |FROM (
              |  SELECT n_name AS nation,
              |         CAST(extract(year FROM o_orderdate) AS BIGINT) AS o_year,
              |         CAST(l_extendedprice * (1 - l_discount)
              |           - 0.6 * p_retailprice * l_quantity AS DOUBLE) AS amount
              |  FROM part
              |  JOIN lineitem ON p_partkey = l_partkey
              |  JOIN supplier ON s_suppkey = l_suppkey
              |  JOIN orders ON o_orderkey = l_orderkey
              |  JOIN nation ON s_nationkey = n_nationkey
              |  WHERE p_name LIKE '%red%'
              |) profit GROUP BY nation, o_year
              |ORDER BY nation, o_year DESC""".stripMargin
    NamedQuery("q103_tpch_q9", Some(q), viewsSql(q, "part", "lineitem",
      "supplier", "orders", "nation"))
  }

  /** Q14 shape: promo revenue share over one month. */
  private val q14ish: NamedQuery = {
    val q = """SELECT round(100.00 * sum(CASE WHEN p_type = 'PROMO'
              |  THEN CAST(l_extendedprice * (1 - l_discount) AS DOUBLE)
              |  ELSE 0 END) /
              |  sum(CAST(l_extendedprice * (1 - l_discount) AS DOUBLE)), 4)
              |  AS promo_revenue
              |FROM lineitem JOIN part ON l_partkey = p_partkey
              |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
              |  AND l_shipdate < TIMESTAMP '1997-02-01 00:00:00'""".stripMargin
    NamedQuery("q104_tpch_q14", Some(q), viewsSql(q, "lineitem", "part"))
  }

  /** Q15 shape: the top supplier by quarterly revenue via a scalar MAX
    * subquery over a CTE evaluated twice. */
  private val q15ish: NamedQuery = {
    val q = """WITH revenue AS (
              |  SELECT l_suppkey AS supplier_no,
              |         round(sum(l_extendedprice * (1 - l_discount)), 2)
              |           AS total_revenue
              |  FROM lineitem
              |  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
              |    AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
              |  GROUP BY l_suppkey)
              |SELECT s_suppkey, s_name, total_revenue
              |FROM supplier JOIN revenue ON s_suppkey = supplier_no
              |WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
              |ORDER BY s_suppkey""".stripMargin
    NamedQuery("q105_tpch_q15", Some(q), viewsSql(q, "lineitem", "supplier"))
  }

  /** Q17 shape: revenue of small-quantity orders against a correlated
    * per-part average. */
  private val q17ish: NamedQuery = {
    val q = """SELECT round(CAST(sum(l_extendedprice) AS DOUBLE) / 7.0, 2)
              |  AS avg_yearly
              |FROM lineitem JOIN part ON p_partkey = l_partkey
              |WHERE p_brand = 'Brand#1'
              |  AND l_quantity < (SELECT 0.2 * avg(l_quantity)
              |                    FROM lineitem l2
              |                    WHERE l2.l_partkey = p_partkey)""".stripMargin
    NamedQuery("q106_tpch_q17", Some(q), viewsSql(q, "lineitem", "part"))
  }

  /** Q19 shape: disjunctive brand/size/quantity predicates — the plan
    * where OR-groups must still push the join predicate. */
  private val q19ish: NamedQuery = {
    val q = """SELECT round(sum(l_extendedprice * (1 - l_discount)), 2)
              |  AS revenue
              |FROM lineitem JOIN part ON p_partkey = l_partkey
              |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5
              |       AND l_quantity BETWEEN 1 AND 11)
              |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10
              |       AND l_quantity BETWEEN 10 AND 20)
              |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
              |       AND l_quantity BETWEEN 20 AND 30)""".stripMargin
    NamedQuery("q107_tpch_q19", Some(q), viewsSql(q, "lineitem", "part"))
  }

  /** Q21 shape (adapted — no commit/receipt dates in the synthetic
    * schema): suppliers alone at fault in multi-supplier finished
    * orders, via chained correlated EXISTS / NOT EXISTS. */
  private val q21ish: NamedQuery = {
    val q = """SELECT s_name, count(*) AS numwait
              |FROM supplier
              |JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
              |JOIN orders ON o_orderkey = l1.l_orderkey
              |WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
              |  AND EXISTS (SELECT 1 FROM lineitem l2
              |              WHERE l2.l_orderkey = l1.l_orderkey
              |                AND l2.l_suppkey <> l1.l_suppkey)
              |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
              |                  WHERE l3.l_orderkey = l1.l_orderkey
              |                    AND l3.l_suppkey <> l1.l_suppkey
              |                    AND l3.l_returnflag = 'R')
              |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 20""".stripMargin
    NamedQuery("q108_tpch_q21", Some(q),
      viewsSql(q, "supplier", "lineitem", "orders"))
  }

  /** Q2 shape: min-cost supplier per part within a region — the
    * correlated-scalar-subquery-over-an-aggregate pattern (the synthetic
    * schema has no partsupp; per-(part, supplier) unit cost derives from
    * lineitem). Catalyst decorrelates the subquery into an aggregate +
    * join, so the "for each part" min never executes per-row. */
  private val q2ish: NamedQuery = {
    val q = """WITH cost AS (
              |  SELECT l_partkey, l_suppkey,
              |    min(CAST(l_extendedprice AS DOUBLE) /
              |        CAST(l_quantity AS DOUBLE)) AS unit_cost
              |  FROM lineitem GROUP BY 1, 2)
              |SELECT p_partkey, p_name, s_name,
              |  round(c.unit_cost, 4) AS best_cost
              |FROM part p
              |JOIN cost c ON p_partkey = c.l_partkey
              |JOIN supplier s ON s_suppkey = c.l_suppkey
              |JOIN nation n ON s_nationkey = n_nationkey
              |JOIN region r ON n_regionkey = r_regionkey
              |WHERE r_name = 'EUROPE' AND p_size <= 5
              |  AND c.unit_cost = (
              |    SELECT min(c2.unit_cost) FROM cost c2
              |    JOIN supplier s2 ON s2.s_suppkey = c2.l_suppkey
              |    JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
              |    JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
              |    WHERE c2.l_partkey = p.p_partkey AND r2.r_name = 'EUROPE')""".stripMargin
    NamedQuery("q124_tpch_q2", Some(q),
      viewsSql(q, "part", "lineitem", "supplier", "nation", "region"))
  }

  /** Q6: the forecast-revenue filter-aggregate — fully pushed-down
    * predicates, one partial+final sum, zero joins. */
  private val q6ish: NamedQuery = {
    val q = """SELECT round(sum(CAST(l_extendedprice AS DOUBLE) * l_discount), 2)
              |  AS revenue
              |FROM lineitem
              |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
              |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
              |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin
    NamedQuery("q125_tpch_q6", Some(q), viewsSql(q, "lineitem"))
  }

  /** Q11 shape: parts whose value within one region exceeds a global
    * threshold — the group-sum vs scalar-subquery-over-the-same-CTE
    * pattern; the CTE is read twice (per-part sums and the corpus-wide
    * average), both from one shuffled aggregate. The avg-based cut is
    * scale-free (TPC-H's 0.0001/SF fraction in spirit): it selects
    * above-average parts at every sf tier. */
  private val q11ish: NamedQuery = {
    val q = """WITH val AS (
              |  SELECT l_partkey, sum(CAST(l_extendedprice AS DOUBLE)) AS v
              |  FROM lineitem
              |  JOIN supplier ON l_suppkey = s_suppkey
              |  JOIN nation ON s_nationkey = n_nationkey
              |  WHERE n_regionkey = 3
              |  GROUP BY l_partkey)
              |SELECT l_partkey, round(v, 2) AS part_value
              |FROM val
              |WHERE v > (SELECT avg(v) * 1.5 FROM val)""".stripMargin
    NamedQuery("q126_tpch_q11", Some(q),
      viewsSql(q, "lineitem", "supplier", "nation"))
  }

  /** Q12 shape: per-category conditional priority counts over the
    * orders⋈lineitem join (the synthetic schema has no l_shipmode;
    * return flag plays the category and shipped-after-order the lateness
    * predicate). */
  private val q12ish: NamedQuery = {
    val q = """SELECT l_returnflag,
              |CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
              |  THEN 1 ELSE 0 END) AS BIGINT) AS high_count,
              |CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
              |  THEN 1 ELSE 0 END) AS BIGINT) AS low_count
              |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
              |WHERE l_shipdate >= o_orderdate
              |GROUP BY l_returnflag""".stripMargin
    NamedQuery("q127_tpch_q12", Some(q), viewsSql(q, "orders", "lineitem"))
  }

  /** Q20 shape: suppliers moving excess volume of matching parts — the
    * nested IN (semi-join) over a grouped HAVING over another IN. */
  private val q20ish: NamedQuery = {
    val q = """SELECT s_suppkey, s_name
              |FROM supplier JOIN nation ON s_nationkey = n_nationkey
              |WHERE n_regionkey = 2
              |  AND s_suppkey IN (
              |    SELECT l_suppkey FROM lineitem
              |    WHERE l_partkey IN
              |      (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
              |    GROUP BY l_suppkey, l_partkey
              |    HAVING sum(l_quantity) > 50)""".stripMargin
    NamedQuery("q128_tpch_q20", Some(q),
      viewsSql(q, "supplier", "nation", "lineitem", "part"))
  }

  def defs: Seq[NamedQuery] =
    Seq(q4ish, q10ish, q13ish, q16ish, q18ish, q22ish,
      q7ish, q8ish, q9ish, q14ish, q15ish, q17ish, q19ish, q21ish,
      q2ish, q6ish, q11ish, q12ish, q20ish)
}
