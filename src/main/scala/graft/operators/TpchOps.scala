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

  def defs: Seq[NamedQuery] =
    Seq(q4ish, q10ish, q13ish, q16ish, q18ish, q22ish)
}
