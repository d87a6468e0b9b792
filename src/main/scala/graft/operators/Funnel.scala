package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered multi-step funnel — "users who did A, then B, then C" — the
  * workhorse behavioral-analytics operator. For each entity the funnel
  * finds the EARLIEST chain: `t1` = first step-1 event; `t_i` = first
  * step-i event STRICTLY after `t_{i-1}`, optionally within a horizon
  * measured from `t1`. One row per entity that entered the funnel, with
  * every step's timestamp (null from the first broken step onward — a
  * broken chain stays broken, since each join keys on the previous
  * step's timestamp) and the depth reached.
  *
  * Greedy-earliest is the standard funnel semantics and is correct
  * here: taking the earliest valid event at every step maximizes the
  * reachable depth under an ordered chain with a start-anchored
  * horizon (any later choice only shrinks the time left for later
  * steps).
  *
  * Shape: one hash aggregate for step 1, then per additional step one
  * equi-join on the entity key plus a re-aggregate — k-1 shuffles for a
  * k-step funnel, each partial-combined, nothing quadratic. Funnels are
  * short (k ≤ 6 in practice); entity cardinality, not step count, is
  * the scale axis, and every stage is keyed by entity.
  */
object Funnel {

  /** `(key, t1..tk, depth)` for `steps` event types in order.
    * `withinSec`: horizon from `t1` each later step must land inside.
    */
  def funnel(events: DataFrame, keyCol: String, typeCol: String,
      tsCol: String, steps: Seq[String],
      withinSec: Option[Long] = None): DataFrame = {
    require(steps.size >= 2, s"a funnel needs >= 2 steps, got ${steps.size}")
    require(steps.distinct.size == steps.size,
      "repeated step types are ambiguous — use distinct event types")

    var acc = events.filter(col(typeCol) === steps.head)
      .groupBy(col(keyCol)).agg(min(col(tsCol)).as("t1"))
    for (i <- 2 to steps.size) {
      val prev = col(s"t${i - 1}")
      val step = events.filter(col(typeCol) === steps(i - 1))
        .select(col(keyCol).as("_k"), col(tsCol).as("_ts"))
      val horizon: Column = withinSec
        .map(s => step("_ts") <= col("t1") + expr(s"INTERVAL $s SECONDS"))
        .getOrElse(lit(true))
      val carried = (1 until i).map(j => col(s"t$j"))
      acc = acc.join(step,
          acc(keyCol) === step("_k") && step("_ts") > prev && horizon, "left")
        .groupBy((col(keyCol) +: carried): _*)
        .agg(min(col("_ts")).as(s"t$i"))
    }
    // depth = deepest non-null step; the ascending fold nests so the
    // DEEPEST check is outermost (non-nulls are a prefix by construction)
    val depth = (2 to steps.size).foldLeft(lit(1L)) { (els, i) =>
      when(col(s"t$i").isNotNull, i.toLong).otherwise(els)
    }
    acc.withColumn("depth", depth)
  }

  /** The funnel report — one row per step with how many entities
    * reached it (count of depth ≥ step). An entity at depth d reached
    * steps 1..d, so each depth-histogram row EXPLODES to the steps it
    * proves — pure relational cumulative, no partitionless window, no
    * inequality join; everything after the funnel itself is
    * |steps|-sized. Steps nobody reached are absent.
    */
  def conversion(funnelOut: DataFrame): DataFrame =
    funnelOut.groupBy(col("depth")).agg(count(lit(1)).as("n"))
      .select(explode(sequence(lit(1L), col("depth"))).as("step"), col("n"))
      .groupBy(col("step")).agg(sum(col("n")).as("n_entities"))
}
