package graft

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{IncrementalCdc, KeyedUpsertSink, StoreCommit}

/** The object-store leg of the commit seam (r17 verdict item 1): the
  * keyed store driven end-to-end over [[SimObjFileSystem]] — a local
  * filesystem whose `rename` is the object-store reality (copy, then
  * delete, with an injectable crash between) — proving that on such a
  * store the [[StoreCommit]] MARKER protocol is selected automatically,
  * never calls rename on a control path, matches the rename protocol's
  * store content bit-for-bit, and loses no committed generation across
  * injected crashes, torn uploads, or a mid-section lease takeover.
  */
class StoreObjectCommitSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  override def beforeAll(): Unit = {
    super.beforeAll()
    spark.sparkContext.hadoopConfiguration.set("fs.simobj.impl",
      classOf[SimObjFileSystem].getName)
  }

  /** (simobj URI for the store, raw local path underneath it). */
  private def freshDirs(): (String, String) = {
    val raw = Files.createTempDirectory("graft-simobj").toString
    (s"simobj://$raw/store", s"$raw/store")
  }

  private def mk(rows: (String, Long)*) = rows.toSeq.toDF("k", "ts")

  test("the simulated rename is genuinely non-atomic (the hazard being designed out)") {
    val (_, raw) = freshDirs()
    Files.createDirectories(Paths.get(raw))
    Files.write(Paths.get(raw, "src.txt"), "payload".getBytes("UTF-8"))
    val fs = new Path(s"simobj://$raw/src.txt")
      .getFileSystem(spark.sessionState.newHadoopConf())
    SimObjFileSystem.crashPoint = "after-copy"
    try {
      intercept[java.io.IOException] {
        fs.rename(new Path(s"simobj://$raw/src.txt"),
          new Path(s"simobj://$raw/dst.txt"))
      }
    } finally SimObjFileSystem.crashPoint = ""
    // the tear: both names exist — a pointer "renamed" this way would
    // be resolvable as EITHER file depending on which a reader tries
    assert(Files.exists(Paths.get(raw, "src.txt")))
    assert(Files.exists(Paths.get(raw, "dst.txt")))
  }

  test("simobj stores auto-select markers: no control-path rename, rename store equivalence") {
    val (dir, raw) = freshDirs()
    val localDir = Files.createTempDirectory("graft-localstore").toString
    SimObjFileSystem.renamedPaths.clear()
    // the same batch sequence against both protocols: create, overwrite
    // a key, re-deliver a batch id, versionWins regress attempt, compact
    def drive(d: String): Unit = {
      KeyedUpsertSink.upsertBatch(mk("a" -> 1L, "b" -> 1L), d, Seq("k"),
        "ts", 0L, versionWins = true)
      KeyedUpsertSink.upsertBatch(mk("b" -> 5L, "c" -> 2L), d, Seq("k"),
        "ts", 1L, versionWins = true)
      KeyedUpsertSink.upsertBatch(mk("b" -> 5L, "c" -> 2L), d, Seq("k"),
        "ts", 1L, versionWins = true) // re-delivery
      KeyedUpsertSink.upsertBatch(mk("b" -> 3L), d, Seq("k"),
        "ts", 2L, versionWins = true) // stale write must not regress b=5
      KeyedUpsertSink.compact(spark, d, Seq("k"))
    }
    drive(dir)
    drive(localDir)
    val obj = KeyedUpsertSink.readStore(spark, dir).get
      .as[(String, Long)].collect().toSet
    val loc = KeyedUpsertSink.readStore(spark, localDir).get
      .as[(String, Long)].collect().toSet
    assert(obj === Set("a" -> 1L, "b" -> 5L, "c" -> 2L))
    assert(obj === loc)
    // marker layout on the object store, pointer file on the local one
    assert(Files.isDirectory(Paths.get(raw, "_CURRENT.d")))
    assert(!Files.exists(Paths.get(raw, "_CURRENT")))
    assert(Files.exists(Paths.get(localDir, "_CURRENT")))
    // the marker protocol never renamed a control path — the non-atomic
    // primitive is avoided, not merely survived (parquet task commits
    // may rename under gen-*/; those are made safe by the pointer
    // ordering, not by rename atomicity)
    val controlRenames = SimObjFileSystem.renamedPaths.asScala
      .filter(p => p.contains("_CURRENT") || p.contains("_LOCK"))
    assert(controlRenames.isEmpty,
      s"control paths renamed on the object store: $controlRenames")
    // pointer markers are pruned with a one-commit grace window
    val markers = Files.list(Paths.get(raw, "_CURRENT.d")).iterator()
      .asScala.size
    assert(markers <= 2, s"marker GC left $markers files")
  }

  test("a crash between the generation write and the pointer commit loses nothing") {
    val (dir, _) = freshDirs()
    KeyedUpsertSink.upsertBatch(mk("a" -> 1L), dir, Seq("k"), "ts", 0L)
    KeyedUpsertSink.preFlipHold =
      () => throw new RuntimeException("injected crash before commit")
    try {
      intercept[RuntimeException] {
        KeyedUpsertSink.upsertBatch(mk("a" -> 9L, "b" -> 2L), dir,
          Seq("k"), "ts", 1L)
      }
    } finally KeyedUpsertSink.preFlipHold = () => ()
    // the committed generation is intact: the crashed batch is invisible
    assert(KeyedUpsertSink.readStore(spark, dir).get
      .as[(String, Long)].collect().toSet === Set("a" -> 1L))
    // at-least-once re-delivery of the same batch id completes cleanly
    KeyedUpsertSink.upsertBatch(mk("a" -> 9L, "b" -> 2L), dir,
      Seq("k"), "ts", 1L)
    assert(KeyedUpsertSink.readStore(spark, dir).get
      .as[(String, Long)].collect().toSet === Set("a" -> 9L, "b" -> 2L))
  }

  test("a torn marker upload (no sentinel) is ignored by readers and commits alike") {
    val (dir, raw) = freshDirs()
    KeyedUpsertSink.upsertBatch(mk("a" -> 1L), dir, Seq("k"), "ts", 0L)
    // a torn upload at a HIGH sequence number: readable only if the
    // reader wrongly trusts incomplete markers
    Files.write(
      Paths.get(raw, "_CURRENT.d", "p" + "9" * 20 + "-torn"),
      "buckets=16\n0=gen-999".getBytes("UTF-8"))
    assert(KeyedUpsertSink.readStore(spark, dir).get
      .as[(String, Long)].collect().toSet === Set("a" -> 1L))
    KeyedUpsertSink.upsertBatch(mk("b" -> 2L), dir, Seq("k"), "ts", 1L)
    assert(KeyedUpsertSink.readStore(spark, dir).get
      .as[(String, Long)].collect().toSet === Set("a" -> 1L, "b" -> 2L))
  }

  test("marker lock: exclusion, stale takeover, and release") {
    val (dir, raw) = freshDirs()
    Files.createDirectories(Paths.get(raw))
    val p1 = StoreCommit.forStore(spark, dir)
    assert(p1.tryAcquire("tok-1", "w1"))
    assert(p1.ownerToken() === Some("tok-1"))
    // a second contender cannot undercut a live owner
    val p2 = StoreCommit.forStore(spark, dir)
    assert(!p2.tryAcquire("tok-2", "w2"))
    assert(p1.ownerToken() === Some("tok-1"))
    // heartbeat refreshes liveness without touching the candidate
    Thread.sleep(60)
    p1.refresh("tok-1")
    assert(p1.lockAge().exists(_._1 < 60))
    // a crashed owner: backdate candidate + heartbeat past any lease
    val election = Paths.get(raw, "_LOCK.d")
    Files.list(election).iterator().asScala.foreach { f =>
      Files.setLastModifiedTime(f,
        java.nio.file.attribute.FileTime.fromMillis(
          System.currentTimeMillis() - 3600 * 1000L))
    }
    val obs = p2.lockAge()
    assert(obs.exists(_._1 > 300000L))
    assert(p2.tryTakeover("tok-2", obs.get._2))
    assert(p2.tryAcquire("tok-2", "w2"))
    assert(p2.ownerToken() === Some("tok-2"))
    // the zombie's release must not dent the new owner's lock
    p1.release("tok-1")
    assert(p2.ownerToken() === Some("tok-2"))
    p2.release("tok-2")
    assert(p2.ownerToken() === None)
  }

  test("takeover removes only the lock that was judged stale, never its replacement") {
    // marker protocol (simobj) and rename protocol (local) both: a
    // waiter whose staleness judgment predates a release+re-acquire
    // must NOT delete the fresh lock (ADVICE r18 — the robbed writer
    // would abort with 'lease lost mid-section' under a benign race)
    val (objDir, objRaw) = freshDirs()
    Files.createDirectories(Paths.get(objRaw))
    val localDir = Files.createTempDirectory("graft-takeover").toString
    for (dir <- Seq(objDir, localDir)) {
      val p = StoreCommit.forStore(spark, dir)
      assert(p.tryAcquire("tok-old", "w-old"))
      val obs = p.lockAge()
      assert(obs.nonEmpty)
      // the observed owner releases and a peer re-acquires in between
      p.release("tok-old")
      assert(p.tryAcquire("tok-new", "w-new"))
      assert(!p.tryTakeover("tok-waiter", obs.get._2),
        s"$dir: takeover deleted a fresh live lock")
      assert(p.ownerToken() === Some("tok-new"))
      p.release("tok-new")
    }
  }

  test("orphan heartbeat files are swept at release") {
    val (dir, raw) = freshDirs()
    Files.createDirectories(Paths.get(raw, "_LOCK.d"))
    // a zombie's stranded heartbeat from a long-gone takeover
    Files.write(Paths.get(raw, "_LOCK.d", "hb-zombie"),
      "123".getBytes("UTF-8"))
    val p = StoreCommit.forStore(spark, dir)
    assert(p.tryAcquire("tok-1", "w1"))
    p.refresh("tok-1")
    p.release("tok-1")
    val left = Files.list(Paths.get(raw, "_LOCK.d")).iterator().asScala
      .map(_.getFileName.toString).toSeq
    assert(left.isEmpty, s"election dir not swept: $left")
  }

  test("a store recreated under the other layout re-resolves instead of mis-pinning") {
    val root = Files.createTempDirectory("graft-relayout").toString
    val dir = s"$root/store"
    KeyedUpsertSink.upsertBatch(mk("a" -> 1L), dir, Seq("k"), "ts", 0L)
    assert(Files.exists(Paths.get(dir, "_CURRENT")))
    // out-of-band: the dir is deleted and recreated as a MARKER store
    // while this JVM's protocol cache still holds RenameCommit
    def wipe(p: java.nio.file.Path): Unit = {
      if (Files.isDirectory(p))
        Files.list(p).iterator().asScala.toSeq.foreach(wipe)
      Files.deleteIfExists(p)
    }
    wipe(Paths.get(dir))
    Files.createDirectories(Paths.get(dir, "_CURRENT.d"))
    Files.write(Paths.get(dir, "_CURRENT.d", "p" + "0" * 19 + "1-x"),
      "buckets=16\n#end\n".getBytes("UTF-8"))
    // the cached rename protocol finds no _CURRENT, detects the marker
    // layout, invalidates itself, and fails LOUD instead of treating
    // the populated store as brand new
    intercept[IllegalStateException] {
      KeyedUpsertSink.readState(spark, dir)
    }
    // the retry re-resolves to markers and reads the recreated store
    assert(KeyedUpsertSink.readState(spark, dir).exists(_.numBuckets == 16))
  }

  test("fence on markers: a writer whose lease was usurped aborts before the flip") {
    val (dir, raw) = freshDirs()
    KeyedUpsertSink.upsertBatch(mk("k0" -> 0L), dir, Seq("k"), "ts", 0L)
    val ptrBefore = Files.list(Paths.get(raw, "_CURRENT.d")).iterator()
      .asScala.map(_.getFileName.toString).toSet
    KeyedUpsertSink.preFlipHold = () => Thread.sleep(1200)
    try {
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val victim = new Thread(() => {
        try KeyedUpsertSink.upsertBatch(mk("k1" -> 1L), dir, Seq("k"),
          "ts", 1L)
        catch { case t: Throwable => errs.add(t) }
      })
      victim.start()
      // wait for the victim's candidate, then usurp: remove it and win
      // the now-free election — the shape of a peer that (wrongly or
      // rightly) judged the lease stale mid-section
      val election = Paths.get(raw, "_LOCK.d")
      val t0 = System.nanoTime()
      def candidates() =
        if (!Files.isDirectory(election)) Seq.empty
        else Files.list(election).iterator().asScala
          .map(_.getFileName.toString).filter(_.startsWith("c")).toSeq
      while (candidates().isEmpty && (System.nanoTime() - t0) / 1e9 < 20)
        Thread.sleep(10)
      assert(candidates().nonEmpty, "victim never acquired the lock")
      Thread.sleep(100)
      val usurper = StoreCommit.forStore(spark, dir)
      val seen = usurper.lockAge()
      assert(seen.nonEmpty, "usurper observed no lock to take over")
      assert(usurper.tryTakeover("tok-usurper", seen.get._2))
      assert(usurper.tryAcquire("tok-usurper", "usurper"))
      victim.join(30000)
      assert(!victim.isAlive, "victim writer hung")
      assert(errs.size() === 1, "victim must abort once the lease is lost")
      assert(errs.peek().getMessage.contains("lost mid-section"),
        s"wrong failure: ${errs.peek().getMessage}")
      // no flip: the marker set is byte-for-byte the pre-crash one and
      // the store still reads only the seed row
      val ptrAfter = Files.list(Paths.get(raw, "_CURRENT.d")).iterator()
        .asScala.map(_.getFileName.toString).toSet
      assert(ptrAfter === ptrBefore, "dispossessed writer flipped the pointer")
      assert(KeyedUpsertSink.readStore(spark, dir).get.count() === 1L)
      // and the victim's release did not remove the usurper's lock
      assert(usurper.ownerToken() === Some("tok-usurper"))
      usurper.release("tok-usurper")
    } finally KeyedUpsertSink.preFlipHold = () => ()
  }

  test("params pin on the object store: write-once put, no rename, torn-pin repair") {
    import graft.operators.DeltaLog
    val (dir, raw) = freshDirs()
    Files.createDirectories(Paths.get(raw))
    SimObjFileSystem.renamedPaths.clear()
    DeltaLog.pinParams(spark, dir, Map("depth" -> "4", "width" -> "1024"))
    // idempotent re-pin; conflicting re-pin fails loudly
    DeltaLog.pinParams(spark, dir, Map("depth" -> "4", "width" -> "1024"))
    intercept[IllegalArgumentException] {
      DeltaLog.pinParams(spark, dir, Map("depth" -> "8", "width" -> "1024"))
    }
    assert(DeltaLog.readParams(spark, dir) ===
      Some(Map("depth" -> "4", "width" -> "1024")))
    assert(!SimObjFileSystem.renamedPaths.asScala.exists(_.contains("_PARAMS")),
      "the pin must never ride a rename on an object store")
    // a torn creation-time upload (cut mid-line, no sentinel): reads
    // throw rather than silently passing, and the next pin repairs it
    val (dir2, raw2) = freshDirs()
    Files.createDirectories(Paths.get(raw2))
    Files.write(Paths.get(raw2, "_PARAMS"), "depth=4\nwid".getBytes("UTF-8"))
    intercept[IllegalStateException] { DeltaLog.readParams(spark, dir2) }
    DeltaLog.pinParams(spark, dir2, Map("depth" -> "4", "width" -> "1024"))
    assert(DeltaLog.readParams(spark, dir2) ===
      Some(Map("depth" -> "4", "width" -> "1024")))
  }

  test("the two-hop topology reaches the golden table with the store on the object store") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.TripTopology
    implicit val ctx = spark.sqlContext
    // the TABLE (the DynamoDB analogue) lives on the simulated object
    // store and commits through the marker protocol; the hops'
    // checkpoints and the change log stay on local disk — they are
    // Spark-internal state, not this library's commit path
    val (storeDir, raw) = freshDirs()
    val base = Files.createTempDirectory("graft-topo-obj").toString
    val changesDir = s"$base/changes"
    val input = MemoryStream[String]
    val ingest = TripTopology.ingestWriter(input.toDF(), storeDir,
      changesDir, s"$base/ckpt_i").start()
    val matcher = TripTopology.matcherWriter(spark, changesDir, storeDir,
      s"$base/ckpt_m", maxFilesPerTrigger = 64).start()
    try {
      GoldenFeed.wireJson(spark).grouped(20000).foreach { chunk =>
        input.addData(chunk)
        ingest.processAllAvailable()
      }
      matcher.processAllAvailable()
    } finally { matcher.stop(); ingest.stop() }
    val store = KeyedUpsertSink.readStore(spark, storeDir).get.cache()
    try {
      import org.apache.spark.sql.functions.col
      assert(store.filter(col("sk").startsWith("COMPLETED#")).count() ===
        4468L, "golden completed-trip count through the marker protocol")
      assert(store.filter(col("status") === "processed_by_matcher")
        .count() === 2 * 4468L)
    } finally store.unpersist()
    // and it really ran on markers: both writers' generations landed
    // under a marker-dir pointer, no control-path renames
    assert(Files.isDirectory(Paths.get(raw, "_CURRENT.d")))
    assert(!Files.exists(Paths.get(raw, "_CURRENT")))
  }

  test("an incremental operator rides the seam unchanged on the object store") {
    val (dir, _) = freshDirs()
    val docs1 = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "an entirely different document about spark partitions")
    ).toDF("doc_id", "text")
    val docs2 = Seq(
      (3L, "the quick brown fox jumps over the lazy dog again and again"),
      (4L, "nothing shared with anything else at all here")
    ).toDF("doc_id", "text")
    assert(IncrementalCdc.ingestBatch(docs1, dir, 0L).count() >= 0)
    val pairs = IncrementalCdc.ingestBatch(docs2, dir, 1L)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // doc 3 duplicates doc 1's text: the cross-batch pair must surface
    // from the persisted chunk store through the marker-committed reads
    assert(pairs.contains((1L, 3L)), s"expected (1,3) in $pairs")
  }
}
