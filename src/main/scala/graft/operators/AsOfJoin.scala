package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: for every left row, attach the single right row
  * with the greatest `rightTs <= leftTs` within the same key group —
  * the point-in-time lookup every event pipeline eventually needs
  * (latest price before a trade, latest purchase before a click, last
  * config before a deploy). The reference has no such operator; this is
  * part of the extension surface, expressed Spark-first.
  *
  * Formulation: NOT a range join. Both sides are tagged and unioned,
  * then one window pass per key carries the latest right payload
  * forward (`last(_, ignoreNulls)` over rows-unbounded-preceding) and
  * left rows read it off. That is ONE shuffle on the key and one
  * per-partition sort — exactly the cost of a sort-merge equi-join —
  * with no interval explosion and no per-row subquery, and it scales
  * with |left|+|right| regardless of how far back matches reach
  * (a range-bucketed formulation must pick a max lookback; this one
  * doesn't). Skewed keys spread with the usual salting once matches are
  * tolerance-bounded; unbounded lookback is inherently per-key-serial,
  * like the matcher's stream-stream join state.
  *
  * Semantics:
  *  - left join: unmatched left rows keep null payload columns.
  *  - inclusive: a right row AT the left timestamp matches (right sorts
  *    before left on ties via the side tag).
  *  - right rows must be unique per (keys, rightTs) — pre-aggregate
  *    otherwise (window `last` has no defined order among exact ties).
  *  - null right payload fields are safe: the carried value is the
  *    whole-row struct, never null for a right row, so a null field
  *    rides along instead of falling back to an older row.
  *  - null timestamps: right rows with a null `rightTs` are DROPPED
  *    (they have no position on the time axis; under Spark's
  *    nulls-first ascending window order they would otherwise leak
  *    their payload into every left row before the first real right
  *    row). Left rows with a null `leftTs` are KEPT and never match —
  *    they sort before every non-null-ts row, so no right payload has
  *    been carried yet. Left-join semantics either way.
  *  - null KEYS group together (window `partitionBy` semantics, unlike
  *    SQL equi-join where null never equals null): a null-key left row
  *    can match a null-key right row. Pre-filter null keys on both
  *    sides when SQL join semantics are wanted.
  *  - `tolerance`: optional max staleness; a match older than
  *    `leftTs - tolerance` nulls out (row is kept — left semantics).
  */
object AsOfJoin {

  private def checkNames(left: DataFrame, rightTs: String,
      payload: Seq[String], prefix: String): Unit = {
    require(!payload.contains(rightTs),
      s"payload must not repeat rightTs ('$rightTs'): it is always attached as ${prefix}$rightTs")
    val outNames = (rightTs +: payload).map(prefix + _)
    require(outNames.distinct == outNames,
      s"prefixed payload names collide among themselves: ${outNames.mkString(", ")}")
    val clash = outNames.toSet.intersect(left.columns.toSet)
    require(clash.isEmpty,
      s"prefixed output columns collide with left columns: ${clash.mkString(", ")} — pick another prefix")
  }

  /** @param payload right columns to attach (each emitted as
    *                `prefix + name`); `rightTs` itself is always
    *                attached as `prefix + rightTs`.
    */
  def asofBackward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, payload: Seq[String],
      prefix: String = "asof_", tolerance: Option[Column] = None): DataFrame = {
    checkNames(left, rightTs, payload, prefix)
    val leftCols = left.columns.toSeq
    val pStruct = struct((rightTs +: payload).map(col): _*)
    val r = right.filter(col(rightTs).isNotNull).select(keys.map(col) ++ Seq(
      col(rightTs).as("_t"), lit(0).as("_side"), pStruct.as("_p")): _*)
    val lRowType = org.apache.spark.sql.types.StructType(
      left.schema.fields)
    val l = left.select(keys.map(col) ++ Seq(
      col(leftTs).as("_t"), lit(1).as("_side"),
      lit(null).cast(r.schema("_p").dataType).as("_p"),
      struct(leftCols.map(col): _*).as("_l")): _*)
    val u = l.unionByName(
      r.withColumn("_l", lit(null).cast(lRowType)), allowMissingColumns = false)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_t"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = u.withColumn("_m", last(col("_p"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
    val bounded = tolerance match {
      case Some(tol) => carried.withColumn("_m",
        when(col("_m")(rightTs) >= col("_t") - tol, col("_m")))
      case None => carried
    }
    bounded.select(col("_l.*") +:
      col("_m")(rightTs).as(prefix + rightTs) +:
      payload.map(p => col("_m")(p).as(prefix + p)): _*)
  }

  /** Forward as-of: for every left row, the single right row with the
    * SMALLEST `rightTs >= leftTs` in the key group (next event after,
    * first fill after the order). Mirror image of [[asofBackward]] —
    * same union+window shape and cost, with the window looking forward
    * (`first(_, ignoreNulls)` over current-to-unbounded-following),
    * right rows sorting AFTER left on ties (so an exact-tie right row
    * is still inclusive), and timestamps ordered nulls-LAST so null-ts
    * left rows keep the "never match" rule from the other direction.
    * `tolerance` bounds how far AHEAD the match may be
    * (`rightTs <= leftTs + tolerance`, inclusive). All other null/
    * uniqueness rules as in [[asofBackward]].
    */
  def asofForward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, payload: Seq[String],
      prefix: String = "asof_", tolerance: Option[Column] = None): DataFrame = {
    checkNames(left, rightTs, payload, prefix)
    val leftCols = left.columns.toSeq
    val pStruct = struct((rightTs +: payload).map(col): _*)
    val r = right.filter(col(rightTs).isNotNull).select(keys.map(col) ++ Seq(
      col(rightTs).as("_t"), lit(1).as("_side"), pStruct.as("_p")): _*)
    val lRowType = org.apache.spark.sql.types.StructType(left.schema.fields)
    val l = left.select(keys.map(col) ++ Seq(
      col(leftTs).as("_t"), lit(0).as("_side"),
      lit(null).cast(r.schema("_p").dataType).as("_p"),
      struct(leftCols.map(col): _*).as("_l")): _*)
    val u = l.unionByName(
      r.withColumn("_l", lit(null).cast(lRowType)), allowMissingColumns = false)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_t").asc_nulls_last, col("_side"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val carried = u.withColumn("_m", first(col("_p"), ignoreNulls = true).over(w))
      .filter(col("_side") === 0)
      // nulls-last puts null-ts left rows after every right row, so their
      // forward window is empty already; the guard makes the "null leftTs
      // never matches" rule explicit rather than an ordering consequence
      .withColumn("_m", when(col("_t").isNotNull, col("_m")))
    val bounded = tolerance match {
      case Some(tol) => carried.withColumn("_m",
        when(col("_m")(rightTs) <= col("_t") + tol, col("_m")))
      case None => carried
    }
    bounded.select(col("_l.*") +:
      col("_m")(rightTs).as(prefix + rightTs) +:
      payload.map(p => col("_m")(p).as(prefix + p)): _*)
  }

  /** Tolerance-bounded as-of join, range-bucketed — the HOT-KEY scale
    * path. [[asofBackward]]'s window is one shuffle but per-key-serial:
    * a key holding 10% of both sides becomes one straggler task. When a
    * staleness bound exists (every production point-in-time config),
    * time can join the partition key: any right row matching a left row
    * at `lts` lies in `[lts - tolerance, lts]`, i.e. in the left row's
    * tolerance-width time bucket or the one before it. So: explode each
    * left row to its two probe buckets, equi-join right on
    * (keys, bucket) — the hot key now spreads over its time range —
    * filter to the exact window, reduce to the latest match per left
    * row with a `max_by` HASH aggregate (map-side partial; no window
    * sort), and left-join back so unmatched rows survive.
    *
    * Cost: three shuffles (probe join, max_by, join-back) vs the
    * window's one — buy parallelism with shuffles only where key skew
    * demands it; elsewhere use [[asofBackward]].
    *
    * Semantics: identical to `asofBackward(..., tolerance = Some(t))`
    * for NON-NULL keys (AsOfJoinSpec asserts equality, the contract
    * query shares the DuckDB oracle): the latest `rightTs <= leftTs`
    * either lies within tolerance — then it is also the latest inside
    * the window — or no right row occupies the window at all. Null
    * timestamps follow the same never-match rule. **Null KEYS diverge**:
    * the window form's `partitionBy` groups null keys together (null-key
    * left rows can match null-key right rows), while this form's
    * equi-join never matches a null key (null-key left rows come out
    * unmatched) — SQL join semantics. Pre-filter or coalesce null keys
    * if you need the window behavior. Additionally requires a unique
    * left id column to survive the aggregate.
    *
    * @param leftId    unique-per-left-row column (join-back identity).
    * @param tolerance max staleness in SECONDS (bucket width).
    */
  def asofBackwardRangeBucketed(left: DataFrame, right: DataFrame,
      keys: Seq[String], leftTs: String, rightTs: String, payload: Seq[String],
      leftId: String, toleranceSec: Long,
      prefix: String = "asof_"): DataFrame = {
    require(toleranceSec > 0, s"toleranceSec must be positive: $toleranceSec")
    checkNames(left, rightTs, payload, prefix)

    def bucketOf(ts: Column): Column =
      floor(unix_timestamp(ts) / lit(toleranceSec)).cast("long")
    val r = right.filter(col(rightTs).isNotNull).select(keys.map(col) ++ Seq(
      bucketOf(col(rightTs)).as("_bkt"), col(rightTs).as("_t"),
      struct((rightTs +: payload).map(col): _*).as("_p")): _*)
    val probes = left.filter(col(leftTs).isNotNull)
      .select(Seq(col(leftId).as("_lid"), col(leftTs).as("_lt"),
        explode(array(bucketOf(col(leftTs)), bucketOf(col(leftTs)) - 1))
          .as("_bkt")) ++ keys.map(col): _*)
    val best = probes.join(r, keys :+ "_bkt")
      .filter(col("_t") <= col("_lt") &&
        col("_t") >= col("_lt") - expr(s"INTERVAL $toleranceSec SECOND"))
      .groupBy(col("_lid"))
      .agg(max_by(col("_p"), col("_t")).as("_m"))
    left.join(best, col(leftId) === col("_lid"), "left")
      .select(left.columns.map(col) ++
        (col("_m")(rightTs).as(prefix + rightTs) +:
          payload.map(p => col("_m")(p).as(prefix + p))): _*)
  }

  /** Forward mirror of [[asofBackwardRangeBucketed]] — the hot-key scale
    * path for "next event at-or-after, within `toleranceSec`": a match
    * for a left row at `lts` lies in `[lts, lts + tolerance]`, i.e. in
    * the row's time bucket or the NEXT one, so left rows explode to
    * those two probe buckets, right joins equi on (keys, bucket), the
    * exact window filters, and a `min_by` hash aggregate keeps the
    * EARLIEST match per left row. Same three-shuffle cost, same
    * semantics caveats as the backward form (equal to
    * `asofForward(..., tolerance)` for non-null keys — AsOfJoinSpec
    * asserts it; null keys never equi-join; unique `leftId` required).
    */
  def asofForwardRangeBucketed(left: DataFrame, right: DataFrame,
      keys: Seq[String], leftTs: String, rightTs: String, payload: Seq[String],
      leftId: String, toleranceSec: Long,
      prefix: String = "asof_"): DataFrame = {
    require(toleranceSec > 0, s"toleranceSec must be positive: $toleranceSec")
    checkNames(left, rightTs, payload, prefix)

    def bucketOf(ts: Column): Column =
      floor(unix_timestamp(ts) / lit(toleranceSec)).cast("long")
    val r = right.filter(col(rightTs).isNotNull).select(keys.map(col) ++ Seq(
      bucketOf(col(rightTs)).as("_bkt"), col(rightTs).as("_t"),
      struct((rightTs +: payload).map(col): _*).as("_p")): _*)
    val probes = left.filter(col(leftTs).isNotNull)
      .select(Seq(col(leftId).as("_lid"), col(leftTs).as("_lt"),
        explode(array(bucketOf(col(leftTs)), bucketOf(col(leftTs)) + 1))
          .as("_bkt")) ++ keys.map(col): _*)
    val best = probes.join(r, keys :+ "_bkt")
      .filter(col("_t") >= col("_lt") &&
        col("_t") <= col("_lt") + expr(s"INTERVAL $toleranceSec SECOND"))
      .groupBy(col("_lid"))
      .agg(min_by(col("_p"), col("_t")).as("_m"))
    left.join(best, col(leftId) === col("_lid"), "left")
      .select(left.columns.map(col) ++
        (col("_m")(rightTs).as(prefix + rightTs) +:
          payload.map(p => col("_m")(p).as(prefix + p))): _*)
  }
}
