package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Retention cohort analysis — the third member of the behavioral trio
  * ([[Funnel]] = ordered conversion, [[Sessionize]] = engagement
  * granularity, this = longevity): anchor every entity to the week of
  * its FIRST event, then report how many of each cohort were active k
  * weeks later. The diagonal decay of the (cohort_week, week_offset)
  * matrix is the standard product-health readout, and the same
  * first-touch/activity decomposition drives training-data freshness
  * audits (how much of each ingest cohort still survives curation).
  *
  * Shape: one distinct (entity, week) projection — the activity set,
  * |entities|·|weeks| at most, tiny next to the event table — then a
  * min-aggregate per entity and one self-equi-join on the entity key,
  * all partial-combined hash aggregates keyed by entity or by the
  * |cohorts|²-bounded output key. Nothing scans events twice; nothing
  * is quadratic; weeks are Monday-anchored `date_trunc` in both
  * engines, so the cohort keys are cross-engine identical calendar
  * dates.
  */
object Retention {

  /** `(cohort_week, week_offset, n_active)` — entities from the
    * cohort of `cohort_week` active during week
    * `cohort_week + 7·week_offset`. Offset 0 rows count full cohort
    * sizes (every entity is active in its first week by definition).
    */
  def cohorts(events: DataFrame, key: Column, ts: Column): DataFrame = {
    val active = events
      .select(key.as("k"), date_trunc("week", ts).cast("date").as("w"))
      .distinct()
    val first = active.groupBy(col("k")).agg(min(col("w")).as("cohort_week"))
    active.join(first, "k")
      .groupBy(col("cohort_week"),
        expr("datediff(w, cohort_week) div 7").cast("long").as("week_offset"))
      .agg(count(lit(1)).as("n_active"))
  }
}
