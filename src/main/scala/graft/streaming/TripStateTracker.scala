package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One wire event on the per-trip state path. */
final case class TrackedEvent(
    trip_id: String,
    data_type: String,
    event_ts: java.sql.Timestamp)

/** Keyed state: which sides of the trip have been seen, and when. */
final case class TripState(
    hasStart: Boolean,
    hasEnd: Boolean,
    firstSeen: Long,
    lastSeen: Long)

/** Emitted status transition (the reference's `status` attribute made an
  * event stream): raw -> completed, or expired on state timeout.
  */
final case class TripStatusUpdate(
    trip_id: String,
    status: String,
    n_sides: Int,
    last_event_ts: java.sql.Timestamp)

/** The reference's status lifecycle (`'raw'` on insert, lambda1.py:60;
  * `'processed_by_matcher'`/`'completed'` after the match,
  * lambda2.py:112-142,249-251) re-expressed as an explicit keyed state
  * machine on `flatMapGroupsWithState` — the custom-state escape hatch
  * for semantics the built-in dedup/join operators don't cover (here:
  * emitting a status-transition STREAM, and expiring never-matched trips,
  * which the reference cannot do at all).
  *
  * Scale notes: state is one tiny record per in-flight trip, hash
  * partitioned by trip_id across executors; ProcessingTimeTimeout expires
  * abandoned trips so state is bounded by in-flight volume, not history.
  */
object TripStateTracker {

  /** Per-batch state transition. Emits a status update on every arrival:
    * `raw` while one side is present, `completed` when both sides have
    * been seen (state then clears), `expired` on timeout.
    *
    * `timeoutMs = None` (default) disables expiry: use for replay/tests —
    * with a processing-time timeout Spark schedules no-data micro-batches
    * continuously to evict state, which `processAllAvailable` never
    * settles on. Production streams set a timeout to bound state.
    */
  def trackStatus(events: Dataset[TrackedEvent],
      timeoutMs: Option[Long] = None): Dataset[TripStatusUpdate] = {
    implicit val stateEnc = Encoders.product[TripState]
    implicit val outEnc = Encoders.product[TripStatusUpdate]
    import events.sparkSession.implicits._

    events.groupByKey(_.trip_id)
      .flatMapGroupsWithState[TripState, TripStatusUpdate](
        OutputMode.Update(),
        if (timeoutMs.isDefined) GroupStateTimeout.ProcessingTimeTimeout
        else GroupStateTimeout.NoTimeout) {
        (tripId: String, batch: Iterator[TrackedEvent], state: GroupState[TripState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(TripStatusUpdate(tripId, "expired",
              (if (s.hasStart) 1 else 0) + (if (s.hasEnd) 1 else 0),
              new java.sql.Timestamp(s.lastSeen)))
          } else {
            val events = batch.toSeq
            var s = state.getOption.getOrElse(TripState(
              hasStart = false, hasEnd = false,
              firstSeen = Long.MaxValue, lastSeen = Long.MinValue))
            val updates = events.sortBy(_.event_ts.getTime).iterator.map { e =>
              s = TripState(
                s.hasStart || e.data_type == "trip_start",
                s.hasEnd || e.data_type == "trip_end",
                math.min(s.firstSeen, e.event_ts.getTime),
                math.max(s.lastSeen, e.event_ts.getTime))
              TripStatusUpdate(tripId,
                if (s.hasStart && s.hasEnd) "completed" else "raw",
                (if (s.hasStart) 1 else 0) + (if (s.hasEnd) 1 else 0),
                e.event_ts)
            }.toVector
            if (s.hasStart && s.hasEnd) {
              state.remove() // trip closed; free the state slot
            } else {
              state.update(s)
              timeoutMs.foreach(state.setTimeoutDuration)
            }
            updates.iterator
          }
      }
  }
}
