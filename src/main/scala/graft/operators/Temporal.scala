package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (type 2) history from a change stream —
  * the third temporal primitive next to [[AsOfJoin]] (point-in-time
  * lookup) and [[RangeJoin]] (point-in-interval): turn "value of key K
  * changed to V at time T" rows into validity intervals
  * `[valid_from, valid_to)` so dimension state at any instant is one
  * interval-containment predicate away. The reference keeps only
  * latest-state rows (its LWW table); history intervals are extension
  * surface.
  */
object Temporal {

  /** One output row per input change: `valid_from` = the change ts,
    * `valid_to` = the key's NEXT change ts (exclusive bound; null while
    * current), `is_current` = no later change exists.
    *
    * Requirements/semantics:
    *  - changes must be unique per (keys, ts) — pre-dedup otherwise
    *    (`lead` has no defined order among exact ties).
    *  - null change timestamps are dropped: they have no place on the
    *    validity axis.
    *  - one window pass per key (`lead` over ts) — per-key-serial like
    *    any history reconstruction, parallel across keys; dimension key
    *    cardinality, not history depth, should carry the scale.
    */
  def scd2(changes: DataFrame, keys: Seq[String], ts: String): DataFrame = {
    val reserved = Seq("valid_from", "valid_to", "is_current")
    val clash = reserved.filter(changes.columns.contains)
    require(clash.isEmpty,
      s"input already has output columns: ${clash.mkString(", ")} — rename before scd2")
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(ts))
    changes.filter(col(ts).isNotNull)
      .withColumn("valid_from", col(ts))
      .withColumn("valid_to", lead(col(ts), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }

  /** The dimension as of instant `at`: rows whose validity interval
    * contains it (`valid_from <= at < valid_to`, current rows open).
    * Equivalent to an [[AsOfJoin.asofBackward]] of `at` against the raw
    * change stream — TemporalSpec asserts that equivalence.
    */
  def asOfSnapshot(history: DataFrame, at: Column): DataFrame =
    history.filter(col("valid_from") <= at &&
      (col("valid_to").isNull || col("valid_to") > at))
}
