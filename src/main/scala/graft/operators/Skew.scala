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
}
