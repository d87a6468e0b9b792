package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One keyed, timestamped step event on the streaming funnel path. */
final case class FunnelEvent(
    key: String,
    ts: java.sql.Timestamp,
    step_type: String)

/** Keyed state: timestamps (epoch ms) of the steps completed so far — a
  * PREFIX of the funnel (`times.length` = current depth).
  */
final case class FunnelState(times: List[Long])

/** A depth advance: emitted whenever an entity completes one more step. */
final case class FunnelAdvance(
    key: String,
    depth: Int,
    step_ts: java.sql.Timestamp,
    entered_ts: java.sql.Timestamp)

/** Streaming twin of [[graft.operators.Funnel]]: track each entity's
  * progress through an ordered step list as keyed state, emitting a row
  * every time an entity ADVANCES a step — the live funnel dashboard
  * feed ("user X just reached checkout") rather than the batch report.
  *
  * Semantics (matching the batch operator where a stream can):
  *  - the chain advances on the first step-i event strictly after the
  *    step-(i-1) time, optionally within `withinMs` of the entry event;
  *  - within a micro-batch, events process in event-time order, so
  *    in-order delivery reproduces the batch funnel's greedy-earliest
  *    chain exactly (proven in StreamingFunnelSpec);
  *  - a LATE event that would have advanced the chain earlier cannot
  *    retro-improve an already-advanced state — same
  *    as-known-at-processing-time rule as [[StreamingAsOf]]'s late-dim
  *    policy. Replaying a feed in order converges to the batch answer.
  *
  * Scale: state is at most `steps.length` longs per key — O(keys·k)
  * total, hash-partitioned like all keyed state; an optional
  * processing-time timeout evicts idle keys (abandoned funnels).
  */
object StreamingFunnel {

  def advances(events: Dataset[FunnelEvent], steps: Seq[String],
      withinMs: Option[Long] = None,
      timeoutMs: Option[Long] = None): Dataset[FunnelAdvance] = {
    require(steps.size >= 2, s"a funnel needs >= 2 steps, got ${steps.size}")
    require(steps.distinct.size == steps.size,
      "repeated step types are ambiguous — use distinct event types")
    val stepIdx = steps.zipWithIndex.toMap
    implicit val stateEnc = Encoders.product[FunnelState]
    implicit val outEnc = Encoders.product[FunnelAdvance]
    implicit val keyEnc = Encoders.STRING

    events.groupByKey(_.key)
      .flatMapGroupsWithState[FunnelState, FunnelAdvance](
        OutputMode.Update(),
        if (timeoutMs.isDefined) GroupStateTimeout.ProcessingTimeTimeout
        else GroupStateTimeout.NoTimeout) {
        (key: String, batch: Iterator[FunnelEvent], state: GroupState[FunnelState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var times = state.getOption.map(_.times).getOrElse(Nil)
            val out = Vector.newBuilder[FunnelAdvance]
            // event-time order within the batch -> in-order feeds
            // reproduce the batch funnel's greedy-earliest chain
            batch.toSeq.sortBy(_.ts.getTime).foreach { e =>
              stepIdx.get(e.step_type).foreach { idx =>
                val t = e.ts.getTime
                val inHorizon = times.isEmpty ||
                  withinMs.forall(h => t <= times.head + h)
                // advance only at the NEXT step, strictly after the last
                if (idx == times.length && inHorizon &&
                  (times.isEmpty || t > times.last)) {
                  times = times :+ t
                  out += FunnelAdvance(key, times.length,
                    new java.sql.Timestamp(t),
                    new java.sql.Timestamp(times.head))
                }
              }
            }
            if (times.nonEmpty) {
              state.update(FunnelState(times))
              timeoutMs.foreach(state.setTimeoutDuration)
            }
            out.result().iterator
          }
      }
  }
}
