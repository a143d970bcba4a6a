package graft

import org.apache.spark.sql.functions._

/** Approximate sketches bounded against exact answers. The queries are
  * self-validating (their outputs carry oracle-asserted bound booleans);
  * these tests additionally recompute the raw sketch values and check
  * the bounds independently of the in-query audit. */
class ApproxSpec extends SparkSpec {

  test("q70 self-audit holds; approx_count_distinct within 5% of exact") {
    val rows = SparkEntry.queries("q70_approx_sketches")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("cd_ok"), s"HLL bound failed: $r")
      assert(r.getAs[Boolean]("med_ok"), s"median rank bound failed: $r")
    }
    // independent recomputation of the HLL claim (not via the audit path)
    val cmp = Tables.t(spark, sf, "lineitem").groupBy("l_returnflag").agg(
      approx_count_distinct(col("l_orderkey"), 0.02).as("a"),
      count_distinct(col("l_orderkey")).as("e")).collect()
    cmp.foreach { r =>
      val a = r.getAs[Long]("a").toDouble; val e = r.getAs[Long]("e").toDouble
      assert(math.abs(a - e) / e < 0.05, s"approx $a vs exact $e")
    }
  }

  test("q94 self-audit holds; sketch values bracketed by exact p±0.01") {
    val rows = SparkEntry.queries("q94_percentiles_approx")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("med_ok") && r.getAs[Boolean]("p90_ok") &&
        r.getAs[Boolean]("p10_ok"), s"rank bound failed: $r")
    }
    // independent bracket check on the raw sketch values
    val exact = Tables.t(spark, sf, "lineitem").groupBy("l_returnflag")
      .agg(percentile(col("l_extendedprice"),
        array(Seq(0.49, 0.51, 0.89, 0.91, 0.09, 0.11).map(lit): _*))
        .as("ex"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    val sketch = Tables.t(spark, sf, "lineitem").groupBy("l_returnflag")
      .agg(graft.functions.LogHistogramQuantile.logHistQuantile(
        col("l_extendedprice").cast("double"), Seq(0.5, 0.9, 0.1)).as("ps"))
      .collect()
    sketch.foreach { r =>
      val ex = exact(r.getString(0))
      val ps = r.getSeq[Double](1)
      assert(ps(0) >= ex(0) && ps(0) <= ex(1), s"median ${ps(0)} not in $ex")
      assert(ps(1) >= ex(2) && ps(1) <= ex(3), s"p90 ${ps(1)} not in $ex")
      assert(ps(2) >= ex(4) && ps(2) <= ex(5), s"p10 ${ps(2)} not in $ex")
    }
  }
}
