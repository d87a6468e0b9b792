package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Heavy-hitter join mitigation for the 100 TB path.
  *
  * A shuffled equi-join hashes every row of a key to ONE reducer; a
  * heavy-hitter key (one user id with 10^9 events, one boilerplate
  * document) turns that reducer into the job's straggler or OOM. Two
  * complementary answers live in this library:
  *
  *  - AQE skew-join (on in [[graft.GraftSession]]): Spark splits
  *    oversized SORT-MERGE partitions at runtime and replicates the
  *    matching side. Zero code, but only kicks in for sort-merge joins
  *    past configurable size thresholds.
  *  - SALTING (here): explicit key decomposition that works for ANY join
  *    shape and any engine version — each left row gets a deterministic
  *    salt in [0, salt), the right side is replicated once per salt
  *    value, and the join key becomes (key, salt), spreading a hot key
  *    over `salt` reducers. Cost: right side inflates `salt`x — use for
  *    fact-x-medium-dim joins where the dim is too big to broadcast but
  *    cheap to replicate, with `salt` ~ the observed skew factor.
  */
object SkewJoin {

  /** Inner equi-join of `left` and `right` on `key` with the left side's
    * hot keys spread across `salt` sub-keys. Result equals
    * `left.join(right, key)` row-for-row (each left row meets each
    * matching right row exactly once — the right replica set carries
    * every salt value exactly once).
    *
    * The salt is a deterministic hash of the whole left row, so replays
    * and retries salt identically (no rand(): a task retry would
    * re-shuffle rows to different reducers mid-join).
    */
  def saltedInner(left: DataFrame, right: DataFrame, key: String,
      salt: Int = 16): DataFrame = {
    require(salt > 0, "salt must be positive")
    val l = left.withColumn("_salt",
      pmod(xxhash64(left.columns.map(col): _*), lit(salt.toLong)))
    val r = right.withColumn("_salt",
      explode(sequence(lit(0L), lit(salt.toLong - 1L))))
    l.join(r, l(key) === r(key) && l("_salt") === r("_salt"))
      .drop(r(key)).drop("_salt")
  }
}
