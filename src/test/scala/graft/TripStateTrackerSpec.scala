package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{TrackedEvent, TripStateTracker}

class TripStateTrackerSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def ev(id: String, dt: String, ts: String) =
    TrackedEvent(id, dt, Timestamp.valueOf(ts))

  test("status lifecycle: raw on first side, completed when both seen, state clears") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[TrackedEvent]
    val q = TripStateTracker.trackStatus(input.toDS())
      .writeStream.format("memory").queryName("status").outputMode("update").start()
    try {
      input.addData(ev("t1", "trip_start", "2024-05-25 10:00:00"))
      q.processAllAvailable()
      input.addData(ev("t1", "trip_end", "2024-05-25 10:30:00"),
        ev("t2", "trip_end", "2024-05-25 11:00:00"))
      q.processAllAvailable()
      // t1 closed -> state removed; a NEW t1 start begins a fresh trip
      input.addData(ev("t1", "trip_start", "2024-05-26 09:00:00"))
      q.processAllAvailable()
    } finally q.stop()

    val rows = spark.table("status")
      .as[(String, String, Int, Timestamp)].collect().toSeq
    assert(rows.contains(("t1", "raw", 1, Timestamp.valueOf("2024-05-25 10:00:00"))))
    assert(rows.contains(("t1", "completed", 2, Timestamp.valueOf("2024-05-25 10:30:00"))))
    assert(rows.contains(("t2", "raw", 1, Timestamp.valueOf("2024-05-25 11:00:00"))))
    // fresh state after completion: raw again with 1 side, not completed
    assert(rows.contains(("t1", "raw", 1, Timestamp.valueOf("2024-05-26 09:00:00"))))
    assert(rows.count { case (id, st, _, _) => id == "t1" && st == "completed" } === 1)
  }

  test("both sides in one batch complete immediately, in event-time order") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[TrackedEvent]
    val q = TripStateTracker.trackStatus(input.toDS())
      .writeStream.format("memory").queryName("status2").outputMode("update").start()
    try {
      // end arrives physically first in the batch; tracker sorts by event time
      input.addData(ev("t9", "trip_end", "2024-05-25 10:30:00"),
        ev("t9", "trip_start", "2024-05-25 10:00:00"))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("status2")
      .as[(String, String, Int, Timestamp)].collect().toSeq
    assert(rows === Seq(
      ("t9", "raw", 1, Timestamp.valueOf("2024-05-25 10:00:00")),
      ("t9", "completed", 2, Timestamp.valueOf("2024-05-25 10:30:00"))))
  }
}
