package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sessionize
import graft.sources.MediaColumns

class SessionizeMediaSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("sessions: gap merge is boundary-inclusive; past-gap event starts a new session") {
    val events = Seq(
      (1L, ts("2024-05-25 10:00:00"), 1.0),
      (1L, ts("2024-05-25 10:20:00"), 2.0), // within 30m: same session
      (1L, ts("2024-05-25 10:50:00"), 3.0), // exactly +30m: still merged (inclusive)
      (1L, ts("2024-05-25 11:20:01"), 4.0), // 30m01s after last: NEW session
      (2L, ts("2024-05-25 09:00:00"), 5.0)
    ).toDF("user_id", "ts", "value")
    val out = Sessionize.sessions(events, col("user_id"), col("ts"), col("value"))
      .orderBy("key", "session_start").collect()
    assert(out.length === 3)
    val first = out(0)
    assert(first.getAs[Long]("key") === 1L)
    assert(first.getAs[Long]("n_events") === 3L)
    assert(first.getAs[Double]("total_value") === 6.0)
    assert(out(1).getAs[Long]("n_events") === 1L)
    assert(out(2).getAs[Long]("key") === 2L)
  }

  test("sessions run streaming: session_window + watermark emits closed sessions") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Double)]
    val events = input.toDF().toDF("user_id", "ts", "value")
      .withWatermark("ts", "10 minutes")
    val q = graft.operators.Sessionize.sessions(events,
        col("user_id"), col("ts"), col("value"))
      .writeStream.format("memory").queryName("live_sessions")
      .outputMode("append").start()
    try {
      input.addData((1L, ts("2024-05-25 10:00:00"), 1.0),
        (1L, ts("2024-05-25 10:10:00"), 2.0))
      q.processAllAvailable()
      // advance watermark far past the session end -> session closes
      input.addData((2L, ts("2024-05-25 12:00:00"), 9.0))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("live_sessions").collect()
    assert(rows.length === 1)
    assert(rows.head.getAs[Long]("key") === 1L)
    assert(rows.head.getAs[Long]("n_events") === 2L)
    assert(rows.head.getAs[Double]("total_value") === 3.0)
  }

  test("streaming sessionization golden case: closed sessions equal the batch result on both providers") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx = spark.sqlContext
    val RocksDb =
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    val ProviderKey = "spark.sql.streaming.stateStore.providerClass"

    // the contract feed: the events table's session columns, one
    // deterministic frame driving BOTH the batch aggregate and the stream
    val feed = Tables.events(spark, "/root/testdata/sf0.001")
      .filter(col("user_id").isNotNull && col("ts").isNotNull)
      .select(col("user_id"), col("ts"), col("value"))
      .as[(Long, Timestamp, Option[Double])].collect().toSeq
    assert(feed.nonEmpty)
    val expected = Sessionize.sessions(
        feed.toDF("user_id", "ts", "value"),
        col("user_id"), col("ts"), col("value"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
        r.getLong(3), Option(r.get(4)).map(_.asInstanceOf[Double])))
      .toSet
    val horizon = new Timestamp(
      feed.map(_._2.getTime).max + 30L * 24 * 3600 * 1000)

    Seq(None, Some(RocksDb)).foreach { provider =>
      val old = spark.conf.getOption(ProviderKey)
      provider match {
        case Some(c) => spark.conf.set(ProviderKey, c)
        case None => spark.conf.unset(ProviderKey)
      }
      try {
        val input = MemoryStream[(Long, Timestamp, Option[Double])]
        val name = s"golden_sessions_${provider.isDefined}"
        val q = Sessionize.sessions(
            input.toDF().toDF("user_id", "ts", "value")
              .withWatermark("ts", "1 minute"),
            col("user_id"), col("ts"), col("value"))
          .writeStream.format("memory").queryName(name)
          .outputMode("append").start()
        try {
          // whole feed in one micro-batch: the watermark only advances
          // AFTER a batch, so arrival order cannot drop late rows; the
          // sentinel then pushes the watermark past every session
          input.addData(feed: _*)
          q.processAllAvailable()
          input.addData((-999L, horizon, Some(0.0)))
          q.processAllAvailable()
        } finally q.stop()
        val got = spark.table(name).filter(col("key") =!= -999L)
          .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
            r.getLong(3), Option(r.get(4)).map(_.asInstanceOf[Double])))
          .toSet
        assert(got === expected,
          s"provider=$provider: closed streaming sessions diverge from batch " +
            s"(missing: ${(expected -- got).take(3)}, extra: ${(got -- expected).take(3)})")
      } finally old match {
        case Some(v) => spark.conf.set(ProviderKey, v)
        case None => spark.conf.unset(ProviderKey)
      }
    }
  }

  test("topKPerKey keeps exactly k rows per key with deterministic ties") {
    val df = (1 to 10).map(i => (i % 2, i.toLong, (i % 3).toDouble))
      .toDF("grp", "id", "v")
    val out = Sessionize.topKPerKey(df, Seq("grp"), col("v"), col("id"), 3)
    assert(out.count() === 6)
    assert(out.groupBy("grp").count().collect().forall(_.getLong(1) == 3L))
    // rank 1 in grp 1 = highest v (2.0), smallest id among ties (id=2)
    val top = out.filter(col("grp") === 1 && col("rank") === 1).collect().head
    assert(top.getAs[Long]("id") === 5L) // v: ids 1,3,5,7,9 -> v = 1,0,2,1,0; max v=2 at id 5
  }

  test("media plumbing: synthesis, typed decode stub, frame sampling") {
    val docs = Seq((0L, "a" * 300), (1L, "bc" * 10), (2L, "x")).toDF("doc_id", "text")
    val media = MediaColumns.mediaFromDocuments(docs)
    assert(media.columns.toSet === Set("doc_id", "media_type", "payload", "n_bytes"))
    val byId = media.collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(byId(0L).getAs[String]("media_type") === "image")
    assert(byId(1L).getAs[String]("media_type") === "audio")
    assert(byId(0L).getAs[Int]("n_bytes") === 300)

    val feats = MediaColumns.decodeFeatures(MediaColumns.asMediaRecords(media))
      .collect().map(f => f.doc_id -> f).toMap
    assert(feats(0L).byte_mean === 'a'.toDouble)
    assert(feats(0L).byte_histogram(6) === 300L) // 'a'=0x61 -> bucket 6
    assert(feats(2L).n_bytes === 1)

    val frames = MediaColumns.frameSample(media)
    // doc 0: 300 bytes -> frames at 1,65,129,193 all present; doc 2: only frame 0
    val byDoc = frames.groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byDoc(0L) === 4L)
    assert(byDoc(2L) === 1L)
    // identical windows hash identically
    val md5s = frames.filter(col("doc_id") === 0).select("frame_md5")
      .as[String].collect().toSet
    assert(md5s.size === 1)
  }

  test("resizeStride keeps every k-th byte with exact size accounting") {
    val media = Seq(
      (1L, "image", "abcdefghij"), // stride 4 -> a,e,i
      (2L, "image", "abcd"),       // exactly one stride -> a
      (3L, "image", "")            // empty stays empty
    ).toDF("doc_id", "media_type", "payload_s")
    val out = MediaColumns.resizeStride(media, factor = 4,
        payloadCol = "payload_s")
      .select("doc_id", "resized", "resized_bytes", "stride")
      .as[(Long, String, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(out(1L) === ((1L, "aei", 3L, 4L)))
    assert(out(2L) === ((2L, "a", 1L, 4L)))
    assert(out(3L) === ((3L, "", 0L, 4L)))
  }
}
