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

  test("partitioned write prunes partitions on a filtered read") {
    import org.apache.spark.sql.classic.ClassicConversions.castToImpl
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val base = s"part_write_${System.nanoTime()}"
    val dir = Files.createTempDirectory("graft_part").toString
    engine.registerTable(base, Tables.t(spark, sf, "events")
      .select("event_id", "event_type", "value"))
    engine.writeTable(base, s"$dir/out", "parquet", Seq("event_type"))
    engine.registerTable(s"${base}_back", s"$dir/out")
    val filtered = engine.table(s"${base}_back")
      .filter(col("event_type") === "click")
    val expected = Tables.t(spark, sf, "events")
      .filter(col("event_type") === "click").count()
    assert(filtered.count() == expected)
    // the partition filter must reach the scan: pruned scans read only
    // the matching directory, never the full table
    val scans = castToImpl(filtered).queryExecution.executedPlan.collect {
      case a: AdaptiveSparkPlanExec => a.executedPlan.collect {
        case sc: FileSourceScanExec => sc
      }
      case sc: FileSourceScanExec => Seq(sc)
    }.flatten
    assert(scans.nonEmpty)
    assert(scans.head.partitionFilters.nonEmpty,
      "partition filter not pushed to the scan")
    assert(scans.head.relation.partitionSchema.fieldNames
      .contains("event_type"))
    engine.dropTable(base); engine.dropTable(s"${base}_back")
  }

  test("unsupported format raises") {
    intercept[IllegalArgumentException](
      engine.registerTable("nope", "/tmp/x", "avro"))
  }
}
