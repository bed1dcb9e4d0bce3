package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys at the 100 TB regime.
  *
  * Algebraic aggregations (sum/count/min/max) do NOT need salting —
  * Spark's map-side partial aggregation already collapses hot keys
  * before the shuffle. The pattern that genuinely needs it is the
  * skewed EQUI-JOIN: every row of a hot key lands on one reducer, and
  * AQE's skew-join only splits SORT-MERGE partitions after the fact.
  * Salting splits the hot key across `salts` reducers up front:
  * the big side gets a pseudo-random salt column, the small side is
  * replicated once per salt value, and the join key becomes
  * (key, salt).
  */
object Skew {

  /** Salted equi-join: `big` join `small` on `key`, with the big side's
    * rows spread across `salts` sub-keys and the small side replicated
    * `salts` times. Result rows equal the plain inner join's (salt
    * values only route rows; every (big row, small row) key match meets
    * exactly once). Prefer `broadcast(small)` when the small side fits
    * in memory — salting is for the mid-size dimension that is too big
    * to broadcast but joins a skewed fact. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      salts: Int): DataFrame = {
    require(salts >= 1, s"salts must be >= 1: $salts")
    val spark = big.sparkSession
    // internal column must not collide with (or silently clobber) a
    // user column on EITHER side — withColumn replaces same-named
    // columns and a duplicate name makes the join ambiguous
    val saltCol = {
      val existing = (big.columns ++ small.columns).toSet
      Iterator.from(0).map(i => s"__graft_salt_$i")
        .find(!existing.contains(_)).get
    }
    // Any row->salt assignment yields the same join OUTPUT; the hash of
    // a per-row id just spreads a hot key's rows evenly. (Partition
    // recompute under failure may re-salt a row — harmless for the same
    // reason.)
    val salted = big.withColumn(saltCol,
      pmod(xxhash64(monotonically_increasing_id()), lit(salts.toLong))
        .cast("int"))
    val replicas = spark.range(salts)
      .select(col("id").cast("int").as(saltCol))
    val replicated = small.crossJoin(broadcast(replicas))
    salted.join(replicated, Seq(key, saltCol)).drop(saltCol)
  }
}
