package graft

import org.apache.spark.sql.functions._

/** Approximate sketches bounded against exact answers (no cross-engine
  * oracle exists for sketch internals). */
class ApproxSpec extends SparkSpec {

  test("approx_count_distinct within 5% of exact; approx median sane") {
    val rows = SparkEntry.queries("q70_approx_sketches")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val approx = r.getAs[Long]("approx_orders").toDouble
      val exact = r.getAs[Long]("exact_orders").toDouble
      assert(math.abs(approx - exact) / exact < 0.05,
        s"approx $approx vs exact $exact")
      assert(r.getAs[Double]("approx_median") > 0)
    }
  }

  test("approx percentiles bracketed by exact neighbors at p±0.01") {
    // rank-error bound: each sketch value must land between the exact
    // quantiles one rank-percent either side of its target
    val exact = Tables.t(spark, sf, "lineitem").groupBy("l_returnflag")
      .agg(percentile(col("l_extendedprice"),
        array(Seq(0.49, 0.51, 0.89, 0.91, 0.09, 0.11).map(lit): _*))
        .as("ex"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    val approx = SparkEntry.queries("q94_percentiles_approx")(spark, sf)
      .collect()
    assert(approx.nonEmpty)
    approx.foreach { r =>
      val ex = exact(r.getString(0))
      val (med, p90, p10) =
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))
      assert(med >= ex(0) && med <= ex(1), s"median $med not in $ex")
      assert(p90 >= ex(2) && p90 <= ex(3), s"p90 $p90 not in $ex")
      assert(p10 >= ex(4) && p10 <= ex(5), s"p10 $p10 not in $ex")
    }
  }
}
