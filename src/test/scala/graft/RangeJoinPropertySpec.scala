package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property law for the q140 algebraic range join: the slot-bucketed
  * prefix-sum kernel (JoinOps.rangeJoinAgg / SlotRangeAgg) must equal
  * the pair-ENUMERATING θ-join on adversarial random inputs — exact
  * window-boundary timestamps (cus == pus - 30min is IN, cus == pus is
  * OUT), duplicate instants, clicks clustered at slot edges, empty
  * slots, zero-click purchases. The q140 oracle pins one real dataset;
  * this law pins the algebra across the boundary cases a fixed dataset
  * may never hit. */
class RangeJoinPropertySpec extends SparkSpec {

  private val slotUs = 1800L * 1000000L // 30 minutes

  test("slot-aggregated range join equals the enumerating join") {
    val spark2 = spark
    import spark2.implicits._
    for (seed <- Seq(2L, 17L, 4242L)) {
      val g = for {
        np <- Gen.choose(20, 80)
        nc <- Gen.choose(50, 250)
        // timestamps on a coarse grid spanning ~4 slots so boundary
        // collisions (click exactly at pus or pus - window) are common
        ps <- Gen.listOfN(np, Gen.choose(0L, 4L * slotUs / (10 * 60000000L)))
        cs <- Gen.listOfN(nc, Gen.choose(0L, 4L * slotUs / (10 * 60000000L)))
      } yield (ps.map(_ * 10 * 60000000L), cs.map(_ * 10 * 60000000L))
      val (pus, cus) = g.pureApply(Gen.Parameters.default, Seed(seed))
      val rows =
        pus.zipWithIndex.map { case (us, i) =>
          (i.toLong, us, "purchase", 0.0)
        } ++ cus.zipWithIndex.map { case (us, i) =>
          (10000L + i, us, "click", (i % 7) + 0.25)
        }
      val ev = rows.toDF("event_id", "us", "event_type", "value")
        .withColumn("ts", timestamp_micros(col("us"))).drop("us")

      val fast = graft.operators.JoinOps.rangeJoinAgg(ev, slotUs)
        .collect().map(r => (r.getLong(0), r.getLong(1),
          r.getDouble(2))).toSet

      val p = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("ts").as("pts"))
      val c = ev.filter(col("event_type") === "click")
        .select(col("ts").as("cts"), col("value"))
      val naive = p.join(c,
          col("cts") >= col("pts") - expr("INTERVAL 30 MINUTE") &&
            col("cts") < col("pts"), "left_outer")
        .groupBy("event_id")
        .agg(count(col("cts")).as("n_clicks"),
          round(coalesce(sum("value"), lit(0.0)), 2).as("click_value"))
        .collect().map(r => (r.getLong(0), r.getLong(1),
          r.getDouble(2))).toSet

      assert(fast == naive, s"divergence at seed=$seed")
    }
  }
}
