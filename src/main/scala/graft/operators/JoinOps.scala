package graft.operators

import org.apache.spark.sql.functions._

import graft.Tables.t

/** Multi-way join pipelines in TPC-H shapes — the workload class the
  * reference's analyzer can only refuse to distribute
  * (query_plan_analyzer.cpp:122-131). Join order: fact table streams,
  * every dimension broadcast (none of them grows with the fact table at
  * scale) while orders/customer — which scale with the facts — are left
  * to AQE: broadcast locally, sort-merge with skew-split at 100 TB. */
object JoinOps {

  /** TPC-H Q3 shape (shipping priority): segment-filtered customers ⋈
    * open orders ⋈ late-shipped lineitems, top-10 revenue. */
  val tpchQ3: NamedQuery = NamedQuery("q68_tpch_q3",
    Some("""SELECT l_orderkey,
           |round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           |CAST(o_orderdate AS DATE) AS odate, o_orderpriority
           |FROM customer
           |JOIN orders ON c_custkey = o_custkey
           |JOIN lineitem ON l_orderkey = o_orderkey
           |WHERE c_mktsegment = 'BUILDING'
           |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
           |  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
           |GROUP BY l_orderkey, CAST(o_orderdate AS DATE), o_orderpriority
           |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin),
    (s, d) => {
      val c = t(s, d, "customer").filter(col("c_mktsegment") === "BUILDING")
      val o = t(s, d, "orders")
        .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      val li = t(s, d, "lineitem")
        .filter(col("l_shipdate") > lit("1998-01-01").cast("timestamp"))
      // Join ORDER: orders ⋈ customer first — the BUILDING segment is
      // ~20% of customers, so the orders side entering the fact join
      // shrinks 5× (sf10: 6.85M → 1.34M rows) BEFORE the expensive
      // l_orderkey shuffle. customer scales with the facts, so its hint
      // stays size-gated. shuffle_hash on the shrunken orders side: a
      // per-partition hash build (|side|/numPartitions rows) beats
      // SMJ's sort of the 33M-row filtered lineitem, and the build
      // footprint falls as partitions grow — scale-safe, AQE still
      // skew-splits. Measured sf10: 2.95 s SMJ → see BENCH_NOTES r7.
      val oc = o.join(NamedQuery.maybeBroadcast(c,
          t(s, d, "customer"), 100L << 20),
          col("o_custkey") === col("c_custkey"))
        .select("o_orderkey", "o_orderdate", "o_orderpriority")
      // NOTE: q12's pre-agg-below-the-join trick was measured HERE and
      // rejected (sf10: 2.64 s vs 1.89 s) — with ~13 M near-unique
      // groups the partial hash aggregation costs more than shuffling
      // the raw 4-column rows; pre-agg pays only when it collapses the
      // key space (q12 keeps it because the DISTINCT collapse also
      // removes an Expand pass there).
      li.join(oc.hint("shuffle_hash"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate").cast("date").as("odate"),
          col("o_orderpriority"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"))
        .select("l_orderkey", "revenue", "odate", "o_orderpriority")
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    })

  /** TPC-H Q5 shape (local supplier volume): region→nation→customer and
    * supplier co-location constraint over the order/lineitem facts. */
  val tpchQ5: NamedQuery = NamedQuery("q69_tpch_q5",
    Some("""SELECT n_name,
           |round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
           |FROM region
           |JOIN nation ON n_regionkey = r_regionkey
           |JOIN customer ON c_nationkey = n_nationkey
           |JOIN orders ON o_custkey = c_custkey
           |JOIN lineitem ON l_orderkey = o_orderkey
           |JOIN supplier ON l_suppkey = s_suppkey
           |  AND s_nationkey = c_nationkey
           |WHERE r_name = 'ASIA'
           |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
           |  AND o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
           |GROUP BY n_name""".stripMargin),
    (s, d) => {
      // Push the region predicate transitively: ASIA → its 5 nations →
      // only ASIA suppliers and customers enter the fact joins. Catalyst
      // cannot derive this across join keys (no dynamic filters on flat
      // files), so it's applied structurally. nation/region are bounded
      // (25/5 rows) and broadcast unconditionally; the pruned supplier/
      // customer sets scale with the facts, so their hints are size-gated
      // — at 100 TB they vanish and AQE falls back to shuffle joins.
      val r = t(s, d, "region").filter(col("r_name") === "ASIA")
      val asiaN = t(s, d, "nation")
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .select("n_nationkey", "n_name")
      val suBase = t(s, d, "supplier")
      val suA = suBase
        .join(broadcast(asiaN), col("s_nationkey") === col("n_nationkey"))
        .select("s_suppkey", "s_nationkey")
      val cBase = t(s, d, "customer")
      val cA = cBase
        .join(broadcast(asiaN), col("c_nationkey") === col("n_nationkey"))
        .select("c_custkey", "c_nationkey")
      val o = t(s, d, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp")
          && col("o_orderdate") < lit("1999-01-01").cast("timestamp"))
        .select("o_orderkey", "o_custkey")
      val li = t(s, d, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
      // gate each hint on the BASE table footprint (the nation semi-join
      // only shrinks it; the derived plan's own join-stat estimate is a
      // useless product of child sizes)
      val bcast = 100L << 20
      // shuffle_hash on the date-filtered orders side (sf10: 6.9M rows,
      // 2 cols): per-partition hash build beats sorting the 12M-row
      // supplier-pruned lineitem side; footprint falls with partition
      // count — scale-safe (see q68's note). Measured sf10: 2.14 s SMJ
      // → see BENCH_NOTES r7.
      li.join(NamedQuery.maybeBroadcast(suA, suBase, bcast),
          col("l_suppkey") === col("s_suppkey"))
        .join(o.hint("shuffle_hash"), col("l_orderkey") === col("o_orderkey"))
        .join(NamedQuery.maybeBroadcast(cA, cBase, bcast),
          col("o_custkey") === col("c_custkey")
          && col("s_nationkey") === col("c_nationkey"))
        .join(broadcast(asiaN), col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"))
    })

  /** Approximate sketches — HLL++ distinct counts and percentile
    * sketches — made SELF-VALIDATING: the output carries the exact
    * distinct count plus booleans asserting the sketch error bounds
    * (relative error ≤ 3×rsd for HLL, rank within ±0.005 for the median
    * sketch, audited by one conditional-count pass). The oracle asserts
    * `true` for the bound columns, so a sketch regression flips a hash
    * mismatch — a real correctness row, not a rows-only check. */
  val approxSketches: NamedQuery = NamedQuery("q70_approx_sketches",
    Some("""SELECT l_returnflag,
           |CAST(count(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
           |true AS cd_ok, true AS med_ok
           |FROM lineitem GROUP BY l_returnflag""".stripMargin),
    (s, d) => {
      val li = t(s, d, "lineitem")
        .select(col("l_returnflag"), col("l_orderkey"),
          col("l_extendedprice").cast("double").as("v"))
      // The sketches and the exact distinct count must be SEPARATE
      // aggregations: fused, Spark's single-distinct rewrite keys the
      // first phase by (l_returnflag, l_orderkey), so every partial —
      // including the percentile sketch's QuantileSummaries buffer —
      // is built once per DISTINCT ORDER (millions of object buffers,
      // merged pairwise). Split, the sketch pass has |flags| groups
      // and the distinct pass is a codegen'd two-phase HashAggregate;
      // the 4-row results broadcast-join. Measured sf1: 29 s → ~2 s.
      val sketches = li.groupBy("l_returnflag").agg(
        approx_count_distinct(col("l_orderkey"), 0.02).as("approx_orders"),
        approx_percentile(col("v"), lit(0.5), lit(1000)).as("approx_median"),
        count(lit(1)).as("n"))
      val exact = li.groupBy("l_returnflag")
        .agg(count_distinct(col("l_orderkey")).as("exact_orders"))
      val sk = sketches.join(exact, "l_returnflag")
      li.join(broadcast(sk), "l_returnflag")
        .groupBy("l_returnflag").agg(
          first("exact_orders").as("exact_orders"),
          first("approx_orders").as("approx_orders"),
          (count_if(col("v") < col("approx_median")) * 1.0 / first("n"))
            .as("r_lt"),
          (count_if(col("v") <= col("approx_median")) * 1.0 / first("n"))
            .as("r_le"))
        .select(col("l_returnflag"), col("exact_orders"),
          (abs(col("approx_orders") - col("exact_orders")) * 1.0
            / col("exact_orders") <= 0.06).as("cd_ok"),
          (col("r_lt") <= 0.505 && col("r_le") >= 0.495).as("med_ok"))
    })

  /** Distributed range (interval) join — attribution shape: every
    * purchase opens a 30-minute look-back window and aggregates the
    * clicks (any user) falling inside it. Spark has no native interval
    * join: the naive θ-join plans BroadcastNestedLoopJoin — O(P×C)
    * comparisons — and even a slot-bucketed equi-join must ENUMERATE
    * every (purchase, click) match, which is quadratic in event
    * density: 2.77 G matched pairs at the sf10 tier (BENCH_NOTES), the
    * cost any pair-materializing engine pays, native IEJoin included.
    *
    * Because the query's output is an ALGEBRAIC aggregate per probe
    * (count + sum), the pairs never need to exist: time buckets into
    * window-length (30 min) slots; each slot collapses its clicks into
    * one sorted-timestamp + prefix-sum row and its window-intersecting
    * purchases into one probe-array row (both plain collect_list
    * aggregations); the codegen'd [[graft.functions.SlotRangeAgg]]
    * kernel binary-searches each probe's half-open range — O(C log C +
    * P log C) total, versus O(P·C) enumeration. A purchase spans ≤ 2
    * slots and gets one partial from each (never overlapping — a
    * slot's array holds only its own clicks), merged by a final
    * combiner-friendly sum; purchases with zero clicks flow through
    * the left join of probe-slots to click-slots, so no re-join
    * against the purchase table is needed. Slot ids use integral
    * `div` on unix_micros, never double division (a correctly-rounded
    * quotient can round UP across the floor boundary). At 100 TB the
    * slot width is the knob bounding per-slot array size (narrower
    * slots ⇒ more, smaller groups); a corpus-hot slot would shard into
    * (slot, salt) sub-arrays whose partials merge identically. The
    * pair-enumerating variant stays the right plan only when the pair
    * LIST itself is the output. PlanQualitySpec asserts no nested-loop
    * join survives in the plan. */
  val rangeJoin: NamedQuery = NamedQuery("q140_range_join",
    Some("""WITH p AS (SELECT event_id, ts FROM events
           |  WHERE event_type = 'purchase'),
           |c AS (SELECT ts, value FROM events WHERE event_type = 'click')
           |SELECT p.event_id, CAST(count(c.ts) AS BIGINT) AS n_clicks,
           |  round(coalesce(sum(c.value), 0), 2) AS click_value
           |FROM p LEFT JOIN c ON c.ts >= p.ts - INTERVAL 30 MINUTE
           |  AND c.ts < p.ts
           |GROUP BY p.event_id""".stripMargin),
    (s, d) => rangeJoinAgg(t(s, d, "events")))

  /** The q140 kernel over ANY events frame carrying (event_id, ts,
    * event_type, value) — extracted so RangeJoinPropertySpec can
    * compare it against the enumerating join on adversarial random
    * inputs (boundary-exact timestamps, duplicate instants, empty
    * slots). `slotUs` is the look-back window in microseconds. */
  private[graft] def rangeJoinAgg(ev: org.apache.spark.sql.DataFrame,
      slotUs: Long = 1800L * 1000000L): org.apache.spark.sql.DataFrame = {
      val pb = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), expr("unix_micros(ts)").as("pus"))
        .withColumn("slot", explode(sequence(
          expr(s"(pus - $slotUs) div $slotUs"),
          expr(s"pus div $slotUs"))))
        .groupBy("slot")
        .agg(collect_list(struct(col("event_id"), col("pus"))).as("parr"))
      val cb = ev.filter(col("event_type") === "click")
        .select(expr("unix_micros(ts)").as("cus"), col("value"))
        .withColumn("slot", expr(s"cus div $slotUs"))
        .groupBy("slot")
        .agg(sort_array(collect_list(struct(col("cus"), col("value"))))
          .as("carr"))
      val emptyCarr =
        expr("CAST(array() AS array<struct<cus: bigint, value: double>>)")
      pb.join(cb, Seq("slot"), "left_outer")
        .select(explode(graft.functions.SlotRangeAgg.slotRangeAgg(
          col("parr"), coalesce(col("carr"), emptyCarr), slotUs)).as("r"))
        .groupBy(col("r.id").as("event_id"))
        .agg(sum("r.n").as("n_clicks"),
          round(sum("r.sv"), 2).as("click_value"))
  }

  def defs: Seq[NamedQuery] = Seq(tpchQ3, tpchQ5, approxSketches, rangeJoin)
}
