package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One observation on the streaming heavy-hitter path. */
final case class TopKObs(key: String, value: String)

/** A live counter: `count` may OVERESTIMATE the true frequency by at
  * most `err` (the count the counter inherited when it evicted a
  * predecessor) — the standard Space-Saving error certificate.
  */
final case class TopKCounter(key: String, value: String, count: Long,
    err: Long)

/** Streaming heavy hitters — the live twin of
  * [[graft.operators.Profile.topValues]]: per key, the most frequent
  * values of an UNBOUNDED stream in BOUNDED state, via the
  * Space-Saving algorithm (Metwally et al., "Efficient computation of
  * frequent and top-k elements in data streams"):
  *
  *  - seen value → increment its counter;
  *  - unseen value with a free slot (< m counters) → (1, err 0);
  *  - unseen value, no free slot → EVICT the minimum counter; the new
  *    value inherits `min+1` with `err = min`.
  *
  * Guarantees (classic, and what the spec checks): state is exactly
  * ≤ m counters per key however long the stream runs; every counter
  * overestimates its true count by at most its `err`; any value with
  * true frequency > N/m is guaranteed present. Eviction ties break by
  * (count, value) so replays are deterministic.
  *
  * Scale: keys hash-partition like all keyed state; per-key state is
  * O(m) — the whole monitor is |keys|·m counters, independent of
  * stream length. Each micro-batch emits the key's full (≤ m)-row
  * counter snapshot in Update mode; downstream ranks/filters as
  * needed.
  */
object StreamingTopK {

  def heavyHitters(obs: Dataset[TopKObs], m: Int): Dataset[TopKCounter] = {
    require(m > 0, s"m must be positive, got $m")
    implicit val stateEnc = Encoders.kryo[Map[String, (Long, Long)]]
    implicit val outEnc = Encoders.product[TopKCounter]
    implicit val keyEnc = Encoders.STRING

    obs.groupByKey(_.key)
      .flatMapGroupsWithState[Map[String, (Long, Long)], TopKCounter](
        OutputMode.Update(), GroupStateTimeout.NoTimeout) {
        (key: String, batch: Iterator[TopKObs],
            state: GroupState[Map[String, (Long, Long)]]) =>
          var counters = state.getOption.getOrElse(Map.empty)
          // deterministic fold: Spark does not guarantee a stable
          // intra-group row order across checkpoint replays, so impose
          // one — sort the batch by value before folding. The batch is
          // one key's slice of a micro-batch (bounded), and with a
          // fixed order every eviction choice replays identically; the
          // Space-Saving error certificates hold under ANY order, the
          // sort only pins WHICH near-tied counter survives.
          batch.toSeq.sortBy(_.value).foreach { o =>
            counters.get(o.value) match {
              case Some((c, e)) =>
                counters = counters.updated(o.value, (c + 1, e))
              case None if counters.size < m =>
                counters = counters.updated(o.value, (1L, 0L))
              case None =>
                val (evict, (minC, _)) = counters.minBy { case (v, (c, _)) =>
                  (c, v)
                }
                counters = counters - evict +
                  (o.value -> (minC + 1, minC))
            }
          }
          state.update(counters)
          counters.iterator.map { case (v, (c, e)) =>
            TopKCounter(key, v, c, e)
          }
      }
  }
}
