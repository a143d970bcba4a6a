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

  def defs: Seq[NamedQuery] = Seq(dmlRoundtrip)
}
