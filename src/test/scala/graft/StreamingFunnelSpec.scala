package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{FunnelEvent, StreamingFunnel}

/** MemoryStream tests for the streaming funnel: advance-per-depth
  * emission, cross-batch continuation, batch-funnel equality on
  * in-order feeds, the no-retro-advance late rule, and the horizon.
  */
class StreamingFunnelSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val steps = Seq("view", "click", "purchase")
  private def ts(min: Int) = new java.sql.Timestamp(min * 60000L)
  private def ev(k: String, t: String, min: Int) = FunnelEvent(k, ts(min), t)

  private var n = 0
  private def run(batches: Seq[Seq[FunnelEvent]],
      withinMs: Option[Long] = None): Seq[(String, Int, Long, Long)] = {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[FunnelEvent]
    n += 1
    val name = s"funnel_out_$n"
    val q = StreamingFunnel.advances(input.toDS(), steps, withinMs)
      .writeStream.format("memory").queryName(name).outputMode("update").start()
    try batches.foreach { b => input.addData(b); q.processAllAvailable() }
    finally q.stop()
    spark.table(name)
      .as[(String, Int, java.sql.Timestamp, java.sql.Timestamp)].collect()
      .map(r => (r._1, r._2, r._3.getTime / 60000L, r._4.getTime / 60000L)).toSeq
  }

  test("one advance row per depth; cross-batch continuation") {
    val out = run(Seq(
      Seq(ev("u1", "view", 1), ev("u1", "click", 2)),
      Seq(ev("u1", "purchase", 3), ev("u2", "view", 4))))
    assert(out.toSet === Set(
      ("u1", 1, 1L, 1L), ("u1", 2, 2L, 1L), ("u1", 3, 3L, 1L),
      ("u2", 1, 4L, 4L)))
  }

  test("in-order feed reproduces the batch funnel's chain") {
    // the FunnelSpec timelines, delivered in event-time order
    val feed = Seq(
      ev("f1", "view", 1), ev("f1", "click", 2), ev("f1", "purchase", 3),
      ev("f3", "click", 1), ev("f3", "view", 2),
      ev("f4", "view", 1), ev("f4", "purchase", 2), ev("f4", "click", 3),
      ev("f7", "view", 1), ev("f7", "click", 2), ev("f7", "view", 5)
    ).sortBy(_.ts.getTime)
    val out = run(Seq(feed))
    val depth = out.groupBy(_._1).map { case (k, rows) => k -> rows.map(_._2).max }
    // batch-funnel depths: f1=3, f3=1 (click precedes view), f4=2, f7=2
    assert(depth === Map("f1" -> 3, "f3" -> 1, "f4" -> 2, "f7" -> 2))
    // the advance stream is the depth sequence 1..d for every key
    out.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._2).sorted === (1 to rows.length))
    }
  }

  test("late event cannot retro-advance an already-advanced chain") {
    val out = run(Seq(
      Seq(ev("u", "view", 10)),
      Seq(ev("u", "click", 5)),   // before the view: not strictly after t1
      Seq(ev("u", "click", 12))))
    assert(out.toSet === Set(("u", 1, 10L, 10L), ("u", 2, 12L, 10L)))
  }

  test("horizon from the entry event cuts late advances") {
    val out = run(Seq(Seq(
      ev("u", "view", 1), ev("u", "click", 200))),
      withinMs = Some(3600000L)) // 1 hour
    assert(out.toSet === Set(("u", 1, 1L, 1L)))
  }
}
