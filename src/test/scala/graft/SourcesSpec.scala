package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Source/sink round-trips (SURVEY §2.3): parquet primary; CSV and JSON
  * write→register→query with values intact. */
class SourcesSpec extends SparkSpec {

  private lazy val engine: Engine = Engine(spark)

  private def roundtrip(format: String): Unit = {
    val base = s"src_rt_${format}_${System.nanoTime()}"
    val dir = Files.createTempDirectory(s"graft_$format").toString
    engine.registerTable(base, s"$sf/nation.parquet")
    engine.writeTable(base, s"$dir/out", format)
    engine.registerTable(s"${base}_back", s"$dir/out", format)
    val orig = engine.table(base)
      .select(col("n_nationkey").cast("long"), col("n_name"))
      .orderBy("n_nationkey").collect()
    val back = engine.table(s"${base}_back")
      .select(col("n_nationkey").cast("long"), col("n_name"))
      .orderBy("n_nationkey").collect()
    assert(orig.sameElements(back), s"$format roundtrip mismatch")
    engine.dropTable(base); engine.dropTable(s"${base}_back")
  }

  test("parquet roundtrip")(roundtrip("parquet"))
  test("csv roundtrip")(roundtrip("csv"))
  test("json roundtrip")(roundtrip("json"))

  test("unsupported format raises") {
    intercept[IllegalArgumentException](
      engine.registerTable("nope", "/tmp/x", "avro"))
  }
}
