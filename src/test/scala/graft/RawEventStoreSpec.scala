package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.RawEventStore

class RawEventStoreSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("dedupFirstWins keeps the first row per key in order-column order") {
    val df = Seq(
      ("k1", 1, "a"), ("k1", 2, "b"), ("k2", 5, "c"), ("k2", 3, "d")
    ).toDF("key", "seq", "payload")
    val out = RawEventStore.dedupFirstWins(df, Seq("key"), Seq("seq"))
      .orderBy("key").select("payload").as[String].collect().toSeq
    assert(out === Seq("a", "d"))
  }

  test("withSortKey synthesizes RAW#type#timestamp") {
    val df = Seq(
      ("trip_start", "2024-05-25 10:00:00", null.asInstanceOf[String]),
      ("trip_end", null.asInstanceOf[String], "2024-05-25 10:30:00")
    ).toDF("data_type", "pickup_datetime", "dropoff_datetime")
    val sks = RawEventStore.withSortKey(df).select("sk").as[String].collect().toSet
    assert(sks === Set(
      "RAW#trip_start#2024-05-25 10:00:00",
      "RAW#trip_end#2024-05-25 10:30:00"))
  }

  test("rawOnly prefix predicate filters on SK") {
    val df = Seq("RAW#trip_start#x", "COMPLETED#y", "RAW#trip_end#z")
      .toDF("sk")
    assert(RawEventStore.rawOnly(df).count() === 2)
  }

  test("tripEventsOnly keeps the two trip families") {
    val df = Seq("trip_start", "trip_end", "completed_trip", "other")
      .toDF("data_type")
    assert(RawEventStore.tripEventsOnly(df).count() === 2)
  }

  test("withProcessingMeta stamps status and fills missing record_id") {
    val df = Seq(("t1", "r-existing"), ("t2", null.asInstanceOf[String]))
      .toDF("trip_id", "record_id")
    val out = RawEventStore.withProcessingMeta(df).collect()
    assert(out.forall(_.getAs[String]("status") == "raw"))
    assert(out.forall(_.getAs[java.sql.Timestamp]("processing_timestamp") != null))
    val byId = out.map(r => r.getAs[String]("trip_id") -> r.getAs[String]("record_id")).toMap
    assert(byId("t1") === "r-existing")
    assert(byId("t2") != null && byId("t2").length === 36)
  }
}
