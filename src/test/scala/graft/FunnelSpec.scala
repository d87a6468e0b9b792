package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Funnel

/** Funnel semantics on hand-built timelines: full/partial chains,
  * order violations, horizon cutoffs, earliest-event selection, and
  * broken-chain nulls.
  */
class FunnelSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def ts(min: Int) = new Timestamp(min * 60000L)

  // user 1: view@1 click@2 buy@3      — full chain
  // user 2: view@1 click@2            — depth 2
  // user 3: click@1 view@2            — click precedes view: depth 1 (no click AFTER view)
  // user 4: view@1 buy@2 click@3      — buy before click doesn't count: v,c -> depth 2
  // user 5: view@1 click@200          — click outside the 1h horizon: depth 1
  // user 6: buy@1                     — never entered: absent
  // user 7: view@5 view@1 click@2     — earliest view@1 anchors; click@2 counts
  private def events = Seq(
    (1L, "view", 1), (1L, "click", 2), (1L, "purchase", 3),
    (2L, "view", 1), (2L, "click", 2),
    (3L, "click", 1), (3L, "view", 2),
    (4L, "view", 1), (4L, "purchase", 2), (4L, "click", 3),
    (5L, "view", 1), (5L, "click", 200),
    (6L, "purchase", 1),
    (7L, "view", 5), (7L, "view", 1), (7L, "click", 2)
  ).map { case (u, t, m) => (u, t, ts(m)) }.toDF("user_id", "event_type", "ts")

  private def run(withinSec: Option[Long]) =
    Funnel.funnel(events, "user_id", "event_type", "ts",
        Seq("view", "click", "purchase"), withinSec)
      .collect().map(r => r.getLong(0) ->
        ((Option(r.getTimestamp(1)), Option(r.getTimestamp(2)),
          Option(r.getTimestamp(3)), r.getLong(4)))).toMap

  test("chains, breaks, and depths on hand-built timelines (no horizon)") {
    val out = run(None)
    assert(out.keySet === Set(1L, 2L, 3L, 4L, 5L, 7L)) // 6 never entered
    assert(out(1L) === ((Some(ts(1)), Some(ts(2)), Some(ts(3)), 3L)))
    assert(out(2L) === ((Some(ts(1)), Some(ts(2)), None, 2L)))
    assert(out(3L) === ((Some(ts(2)), None, None, 1L)))
    // user 4: purchase@2 is before click@3, so no purchase after t2=3
    assert(out(4L) === ((Some(ts(1)), Some(ts(3)), None, 2L)))
    // no horizon: user 5's late click still counts
    assert(out(5L)._4 === 2L)
    // earliest view anchors user 7, so click@2 is after view@1
    assert(out(7L) === ((Some(ts(1)), Some(ts(2)), None, 2L)))
  }

  test("horizon measured from t1 cuts late steps") {
    val out = run(Some(3600L)) // 1 hour
    assert(out(5L) === ((Some(ts(1)), None, None, 1L)))
    assert(out(1L)._4 === 3L) // inside the horizon, unchanged
  }

  test("conversion: cumulative reached-step counts from the depth histogram") {
    val out = Funnel.conversion(
      Funnel.funnel(events, "user_id", "event_type", "ts",
        Seq("view", "click", "purchase")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // entered: users 1,2,3,4,5,7 = 6; reached click: 1,2,4,5,7 = 5
    // (user 3's click precedes their view); reached purchase: 1
    assert(out === Map(1L -> 6L, 2L -> 5L, 3L -> 1L))
  }

  test("guards: short or repeated step lists are rejected") {
    intercept[IllegalArgumentException] {
      Funnel.funnel(events, "user_id", "event_type", "ts", Seq("view"))
    }
    intercept[IllegalArgumentException] {
      Funnel.funnel(events, "user_id", "event_type", "ts",
        Seq("view", "view"))
    }
  }
}
