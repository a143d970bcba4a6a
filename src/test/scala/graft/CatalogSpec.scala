package graft

/** V2 TableCatalog: tables resolve as graft.<name> through plain
  * spark.sql with pushdown-capable parquet scans. */
class CatalogSpec extends SparkSpec {

  test("graft catalog resolves tables, lists, and drops") {
    spark.conf.set("spark.sql.catalog.graft",
      "graft.catalog.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft.dir", sf)
    val n = spark.sql("SELECT count(*) AS n FROM graft.lineitem")
      .head().getLong(0)
    assert(n == 6000L)
    // filter + projection through the catalog scan
    val rows = spark.sql(
      """SELECT l_orderkey, l_quantity FROM graft.lineitem
        |WHERE l_quantity BETWEEN 10 AND 12 LIMIT 5""".stripMargin).collect()
    assert(rows.nonEmpty)
    assert(spark.sql("SHOW TABLES IN graft").count() == 10)
    // runtime mount
    graft.catalog.GraftCatalog.instances("graft")
      .mount("li2", s"$sf/lineitem.parquet")
    assert(spark.sql("SELECT count(*) FROM graft.li2").head().getLong(0) == 6000L)
    spark.sql("DROP TABLE graft.li2")
    intercept[Exception](spark.sql("SELECT * FROM graft.li2").collect())
  }

  test("join across catalog tables") {
    spark.conf.set("spark.sql.catalog.graft", "graft.catalog.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft.dir", sf)
    val r = spark.sql(
      """SELECT n_name, count(*) AS n FROM graft.customer
        |JOIN graft.nation ON c_nationkey = n_nationkey
        |GROUP BY n_name""".stripMargin)
    assert(r.count() > 0)
  }
}
