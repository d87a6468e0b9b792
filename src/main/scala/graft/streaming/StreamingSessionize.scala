package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.col

import graft.operators.Sessionize

/** Streaming twin of [[graft.operators.Sessionize]] — and deliberately
  * the THINNEST one in the repo: `session_window` is the same operator
  * batch and streaming, so the twin is watermark + the identical
  * [[Sessionize.sessions]] call. No reimplementation means no semantic
  * drift: gap-merge rules, boundary inclusivity, and aggregate columns
  * are pinned by the batch spec once, and StreamingSessionizeSpec
  * proves the streamed closed-session set equals the batch answer on
  * the same feed.
  *
  * Mechanics: with an event-time watermark, Spark keeps per-key open
  * sessions as state, MERGES sessions that micro-batches split, and in
  * append mode emits a session only once the watermark passes its
  * gap-extended end — i.e. once no late event could still join it.
  * State is O(open sessions); eviction is the watermark itself.
  */
object StreamingSessionize {

  /** Closed gap-based sessions over a STREAMING frame. `watermark` is
    * the lateness bound — how long after its gap-end a session stays
    * open for stragglers before it is finalized and emitted.
    */
  def sessions(events: DataFrame, key: Column, tsCol: String, value: Column,
      gap: String = "30 minutes", watermark: String = "1 hour"): DataFrame =
    Sessionize.sessions(events.withWatermark(tsCol, watermark),
      key, col(tsCol), value, gap)
}
