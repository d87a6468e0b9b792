package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.KeyedUpsertSink
import graft.streaming.{StreamingTripPipeline, TripStore, TripTopology}

/** The literal two-hop reference topology end-to-end (VERDICT r15 item
  * 1): golden feed → ingest hop (RAW items → keyed table + insert log)
  * → change feed → matcher hop (match-on-insert → COMPLETED +
  * processed flips into the SAME table). The final table state must be
  * TripStoreSpec's golden — 4,468 COMPLETED items and exactly the
  * matched RAW pairs flipped to processed_by_matcher — under three
  * adverse schedules:
  *
  *  1. the matcher hop stopped and restarted from its checkpoint
  *     repeatedly mid-stream, including one stop in the middle of a
  *     phase's backlog;
  *  2. BOTH writers live simultaneously (r16 verdict item 3) — the
  *     reference's actual runtime shape, lambda1 and lambda2 writing
  *     the same table in parallel, serialized by the store's writer
  *     lease rather than by the test's schedule;
  *  3. on the RocksDB state-store provider, with an injected crash
  *     BETWEEN the ingest hop's store upsert and its change-log write
  *     (r16 verdict item 5) — the one interleaving the at-least-once
  *     feed contract leans on: the restart re-runs the same batch id,
  *     the upsert re-merges idempotently under versionWins, and the
  *     change log finally lands.
  */
class TopologySpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  /** The golden final-table assertions shared by every schedule. */
  private def assertGolden(storeDir: String): Unit = {
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
        "a matched RAW item was not flagged processed (a flip was lost)")
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

    assertGolden(storeDir)
  }

  test("both hops live CONCURRENTLY (no ping-pong) still reach the golden final table") {
    implicit val ctx = spark.sqlContext
    val base = Files.createTempDirectory("graft-topology-conc").toString
    val storeDir = s"$base/store"
    val changesDir = s"$base/changes"

    val input = MemoryStream[String]
    // both queries started up front and never stopped mid-feed: every
    // micro-batch of either hop races the other for the store's writer
    // lease, and small chunks + a small files-per-trigger keep the two
    // writers genuinely interleaved rather than accidentally phased
    val ingest = TripTopology.ingestWriter(input.toDF(), storeDir, changesDir,
      s"$base/ckpt_ingest").start()
    val matcher = TripTopology.matcherWriter(spark, changesDir, storeDir,
      s"$base/ckpt_matcher", maxFilesPerTrigger = 2).start()
    try {
      GoldenFeed.wireJson(spark).grouped(2000).foreach { chunk =>
        input.addData(chunk) // no barrier — both hops process as they race
      }
      ingest.processAllAvailable()
      // the last ingest batch may land after the matcher's last listing;
      // a second drain is a no-op when the first already caught it
      matcher.processAllAvailable()
      matcher.processAllAvailable()
    } finally {
      ingest.stop(); matcher.stop()
    }

    assertGolden(storeDir)
  }

  test("RocksDB provider + crash between store upsert and change-log write recovers to golden") {
    implicit val ctx = spark.sqlContext
    val base = Files.createTempDirectory("graft-topology-crash").toString
    val storeDir = s"$base/store"
    val changesDir = s"$base/changes"
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val oldProvider = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // hop 1 with a failpoint: die AFTER the first batch's store upsert
      // but BEFORE its change-log write — the adverse ordering the
      // at-least-once feed contract (TripTopology doc) leans on. The
      // wrapped body is ingestWriter's own (TripTopology.ingestBatch).
      val crashed = new java.util.concurrent.atomic.AtomicBoolean(false)
      def ingestQuery(input: MemoryStream[String],
          failFirst: Boolean) =
        TripStore.rawItems(StreamingTripPipeline.parseAndValidate(input.toDF()))
          .writeStream
          .option("checkpointLocation", s"$base/ckpt_ingest")
          .foreachBatch { (batch: DataFrame, id: Long) =>
            TripTopology.ingestBatch(batch, storeDir, changesDir, id,
              KeyedUpsertSink.DefaultNumBuckets,
              afterUpsert = _ =>
                if (failFirst && crashed.compareAndSet(false, true))
                  throw new RuntimeException(
                    "injected crash between upsert and change-log write"))
          }
          .start()

      val feed = GoldenFeed.wireJson(spark)
      val input = MemoryStream[String]
      input.addData(feed.take(5000))
      val q1 = ingestQuery(input, failFirst = true)
      val died = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q1.processAllAvailable()
        q1.awaitTermination()
      }
      assert(died.getMessage.contains("injected crash") ||
        Option(died.getCause).exists(_.getMessage.contains("injected crash")))
      // the crash left the store written but the change log absent for
      // that batch — the matcher must not have anything to see yet
      assert(!new java.io.File(changesDir).exists() ||
        new java.io.File(changesDir).listFiles().isEmpty,
        "change log must not precede the crash point")
      assert(KeyedUpsertSink.readStore(spark, storeDir).nonEmpty,
        "the store upsert happened before the crash")

      // restart from the same checkpoint: Structured Streaming re-runs
      // the SAME batch id; the upsert re-merges idempotently
      // (versionWins) and the change log finally lands
      val q2 = ingestQuery(input, failFirst = false)
      try {
        q2.processAllAvailable()
        input.addData(feed.drop(5000))
        q2.processAllAvailable()
      } finally q2.stop()

      val m = TripTopology.matcherWriter(spark, changesDir, storeDir,
        s"$base/ckpt_matcher", maxFilesPerTrigger = 4).start()
      try m.processAllAvailable() finally m.stop()

      assertGolden(storeDir)
    } finally oldProvider match {
      case Some(v) => spark.conf.set(providerKey, v)
      case None => spark.conf.unset(providerKey)
    }
  }
}
