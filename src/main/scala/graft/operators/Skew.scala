package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for joins whose key distribution is too hot
  * for AQE's runtime skew-split (e.g. a power-law user_id against a
  * per-user dimension at 100 TB).
  *
  * `saltedJoin` explodes the build side `salt` ways and scatters the
  * probe side uniformly across the salts: each hot key's rows land in
  * `salt` different shuffle partitions instead of one. Correct for
  * inner/left joins on equality keys; cost is `salt`× replication of the
  * (small) right side.
  */
object Skew {

  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      salt: Int = 8, joinType: String = "inner"): DataFrame = {
    val saltCol = (abs(xxhash64(monotonically_increasing_id())) % salt)
    val l = left.withColumn("__salt", saltCol.cast("int"))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    l.join(r, l(key) === r(key) && l("__salt") === r("__salt"), joinType)
      .drop("__salt").drop(r(key))
  }

  /** Per-key frequency report — the diagnostic that decides whether a key
    * needs salting (run on a sample at scale). */
  def keySkew(df: DataFrame, key: String, topN: Int = 20): DataFrame =
    df.groupBy(key).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc).limit(topN)

  /** Oracle-checked key-skew report over the events stream: the 10
    * hottest user_ids with their share of total traffic and skew factor
    * (count / mean count) — the diagnostic that decides between plain
    * shuffle, AQE skew-split, and [[saltedJoin]] at 100 TB. Top-k comes
    * from orderBy+limit (TakeOrderedAndProject — per-partition heaps,
    * never a global sort or single-partition window over the
    * user-cardinality frame); the rank window runs on the 10 surviving
    * rows. */
  val skewReport: NamedQuery = NamedQuery("q143_skew_report",
    Some("""WITH c AS (SELECT user_id, count(*) AS n FROM events
           |  GROUP BY user_id),
           |t AS (SELECT sum(n) AS tot, avg(n) AS avg_n FROM c),
           |r AS (SELECT user_id, n,
           |  row_number() OVER (ORDER BY n DESC, user_id) AS rk FROM c)
           |SELECT user_id, CAST(n AS BIGINT) AS n_events,
           |  CAST(floor(n * 10000.0 / tot) AS BIGINT) AS share_bp,
           |  CAST(floor(n * 100.0 / avg_n) AS BIGINT) AS skew_x100,
           |  CAST(rk AS BIGINT) AS rk
           |FROM r, t WHERE rk <= 10 ORDER BY rk""".stripMargin),
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val c = graft.Tables.t(s, d, "events")
        .groupBy("user_id").agg(count(lit(1)).as("n"))
      val tot = c.agg(sum("n").as("tot"), avg("n").as("avg_n"))
      c.orderBy(col("n").desc, col("user_id")).limit(10)
        .crossJoin(broadcast(tot))
        .withColumn("rk", row_number()
          .over(Window.orderBy(col("n").desc, col("user_id"))).cast("long"))
        // floor-of-identical-doubles, not round: Spark's round() goes
        // through the shortest-decimal string (1.275 → 1.28) while
        // DuckDB rounds the binary value (→ 1.27); floor of the same
        // IEEE quotient is engine-independent
        .select(col("user_id"), col("n").as("n_events"),
          floor(col("n") * 10000.0 / col("tot")).cast("long").as("share_bp"),
          floor(col("n") * 100.0 / col("avg_n")).cast("long").as("skew_x100"),
          col("rk"))
    })

  def defs: Seq[NamedQuery] = Seq(skewReport)
}
