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
}
