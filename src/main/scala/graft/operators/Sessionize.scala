package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sessionization and per-key top-k — extension operators over the
  * `events` table (SURVEY.md par.7 item 7).
  *
  * Scale notes:
  *  - [[sessions]] uses Spark's native `session_window` — a single
  *    partial+final session aggregation shuffled by the grouping key; the
  *    same operator runs streaming with a watermark (gap-merge state).
  *    Semantics: a session is extended while events arrive within `gap`
  *    of the last event, boundary-INCLUSIVE — an event at exactly
  *    last_ts + gap merges; only a strictly larger gap starts a new
  *    session (verified empirically, SessionizeMediaSpec).
  *  - [[topKPerKey]] is `row_number` over a partition window; Catalyst
  *    plans a WindowGroupLimit (top-k pushdown) before the full sort at
  *    rank filters like this, so each partition keeps only k rows in the
  *    shuffle.
  */
object Sessionize {

  /** Gap-based sessions per key: (key, session_start, session_end,
    * n_events, total_value). session_end is the max event time (not the
    * gap-extended window end, which embeds the gap constant).
    */
  def sessions(events: DataFrame, key: Column, ts: Column, value: Column,
      gap: String = "30 minutes"): DataFrame =
    events.groupBy(key.as("key"), session_window(ts, gap).as("w"))
      .agg(min(ts).as("session_start"), max(ts).as("session_end"),
        count(lit(1)).as("n_events"), sum(value).as("total_value"))
      .drop("w")

  /** Top-k rows per key by `order` descending (ties broken by `tie`
    * ascending, deterministic).
    */
  def topKPerKey(df: DataFrame, keys: Seq[String], order: Column, tie: Column,
      k: Int): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order.desc, tie.asc)
    df.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }
}
