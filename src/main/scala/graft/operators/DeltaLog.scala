package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** The shared LSM-style delta-log layout of the incremental stores
  * ([[IncrementalBoilerplate]], [[IncrementalSample]],
  * [[DistinctSketch.IncrementalDistinct]]): each ingested batch lands
  * its own MERGEABLE delta under `delta/batch=<id>` (idempotent
  * Overwrite — Structured Streaming re-runs a failed micro-batch under
  * the SAME id, so re-delivery rewrites equal bytes and no crash
  * ordering double-counts), readers fold `newest base + newer deltas`
  * with the store's own merge aggregate, and a periodic [[compact]]
  * folds the log into a fresh `base/upto=<id>` snapshot. All dirs are
  * `_SUCCESS`-gated on read, so a torn write never reads. Single-writer
  * by design (the foreachBatch model).
  *
  * What varies per store is only the MERGE: boilerplate df folds by
  * sum, the weighted sample by rank re-selection, HLL registers by max
  * — each a commutative fold the store passes in as `merge`.
  */
private[graft] object DeltaLog {

  /** Land one batch's delta under its own id. Overwrite IS the
    * idempotence story.
    *
    * Misuse guard (r14 verdict note): the layout is single-writer by
    * contract, and the realistic accident is pointing a DIFFERENT
    * store (a different relation shape) at an existing dir — the fold
    * would then merge garbage or fail obscurely deep in a reader. A
    * committed part's schema must match the incoming delta's (names +
    * types; one parquet-footer read per batch).
    */
  def writeDelta(delta: DataFrame, storeDir: String, batchId: Long): Unit = {
    val spark = delta.sparkSession
    val existing = newestCommitted(spark, s"$storeDir/delta", "batch=")
      .orElse(newestCommitted(spark, s"$storeDir/l1", "upto="))
      .orElse(newestCommitted(spark, s"$storeDir/base", "upto="))
    existing.foreach { case (_, p) =>
      // a bucketed base ([[compactBucketed]]) carries its synthetic
      // partition column — not part of the store's relation schema
      val have = spark.read.parquet(p).drop(BucketCol).schema
        .map(f => f.name -> f.dataType).toMap
      val incoming = delta.schema.map(f => f.name -> f.dataType).toMap
      require(have == incoming,
        s"DeltaLog at $storeDir holds schema $have but this delta carries " +
          s"$incoming — two different stores pointed at one dir?")
    }
    delta.write.mode(SaveMode.Overwrite)
      .parquet(s"$storeDir/delta/batch=$batchId")
  }

  /** The newest committed L1 run ABOVE the newest base — the single-run
    * minor-compaction level ([[compactMinor]]). A run at-or-below the
    * base was superseded by a major compact and is riding out its
    * one-round grace window; it must not fold (a sum merge would
    * double-count rows the base already holds).
    */
  private[graft] def newestRunAbove(spark: SparkSession, storeDir: String,
      base: Option[(Long, String)]): Option[(Long, String)] =
    newestCommitted(spark, s"$storeDir/l1", "upto=")
      .filter { case (id, _) => base.forall(id > _._1) }

  /** The folded state as of the last committed batch: newest committed
    * base snapshot + the newest L1 run above it + every committed delta
    * above BOTH, merged by the store's own aggregate. None before the
    * first ingest.
    */
  def readFolded(spark: SparkSession, storeDir: String,
      merge: DataFrame => DataFrame): Option[DataFrame] = {
    val base = newestCommitted(spark, s"$storeDir/base", "upto=")
    val run = newestRunAbove(spark, storeDir, base)
    val floor = (base.map(_._1).toSeq ++ run.map(_._1)).maxOption
    val deltas = committedIds(spark, s"$storeDir/delta", "batch=")
      .filter { case (id, _) => floor.forall(id > _) }
      .map { case (id, _) => s"$storeDir/delta/batch=$id" }
    // base, run, and deltas read SEPARATELY: bucketed snapshots carry
    // the synthetic `ubkt` partition dirs the deltas lack, so one
    // multi-root read would infer inconsistent schemas
    val baseDf = base.map { case (_, p) =>
      spark.read.parquet(p).drop(BucketCol) }
    val runDf = run.map { case (_, p) =>
      spark.read.parquet(p).drop(BucketCol) }
    val deltaDf =
      if (deltas.isEmpty) None else Some(spark.read.parquet(deltas: _*))
    val srcs = baseDf.toSeq ++ runDf.toSeq ++ deltaDf.toSeq
    // a single pre-folded snapshot (base or run alone) needs no merge:
    // it IS the fold a compact wrote, and every DeltaLog merge is
    // idempotent by the mergeable-summary contract — re-merging would
    // only pay the fold's shuffle (a full window pass of the relation
    // for the LWW stores). Anything with a delta tail, or two
    // snapshots, must cross-merge.
    if (deltas.isEmpty && srcs.size <= 1) srcs.headOption
    else srcs.reduceOption(_ unionByName _).map(merge)
  }

  /** The synthetic hash-bucket partition column of a [[compactBucketed]]
    * base, and its per-base bucket-count marker file.
    */
  private[graft] val BucketCol = "ubkt"
  private val BucketsMarker = "_NBUCKETS"

  /** The shared bucket expression — write side and probe side MUST use
    * this one definition or lookups miss rows.
    */
  private def bucketExpr(hashCols: Seq[String], b: Int) =
    org.apache.spark.sql.functions.pmod(
      org.apache.spark.sql.functions.xxhash64(
        hashCols.map(org.apache.spark.sql.functions.col): _*),
      org.apache.spark.sql.functions.lit(b.toLong)).cast("int")

  /** [[compact]], with the base snapshot HASH-BUCKETED by `hashCols`
    * into `ubkt=<i>` partition dirs, the bucket count scaled to the
    * folded relation (`ceil(rows / targetRowsPerBucket)`) — the autoK
    * discipline applied to storage: a corpus 10x bigger gets 10x the
    * buckets, so a fixed-size batch's [[readFoldedFor]] lookup reads a
    * bounded number of rows at ANY corpus size instead of the full
    * relation (r17 verdict item 4). The count is recorded in a
    * `_NBUCKETS` marker inside the base dir; a reader that finds no
    * marker (pre-bucketed store, or a crash between the parquet commit
    * and the marker write) falls back to the full-relation read —
    * slower, never wrong. At warehouse scale the same layout targets a
    * table format's file-skipping metadata rather than raw partition
    * dirs; the read path is identical.
    */
  /** Write `folded` as a hash-bucketed snapshot at `path` with the
    * count scaled to the relation (`ceil(rows / targetRowsPerBucket)`),
    * recording count and rows in the snapshot's `_NBUCKETS` marker.
    * Shared by [[compactBucketed]] (base snapshots) and
    * [[compactMinor]] (L1 runs).
    */
  private def writeBucketedSnapshot(spark: SparkSession, folded0: DataFrame,
      path: String, hashCols: Seq[String],
      targetRowsPerBucket: Long): Unit = {
    val folded = folded0.localCheckpoint(false)
    val n = folded.count()
    val b = math.max(1L, (n + targetRowsPerBucket - 1) / targetRowsPerBucket)
      .min(1L << 20).toInt
    folded.withColumn(BucketCol, bucketExpr(hashCols, b))
      .repartition(math.min(b, 2048), org.apache.spark.sql.functions.col(BucketCol))
      .write.mode(SaveMode.Overwrite).partitionBy(BucketCol)
      .parquet(path)
    val fs = new Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val out = fs.create(new Path(path, BucketsMarker), true)
    try out.write(s"$b\nrows=$n".getBytes("UTF-8")) finally out.close()
  }

  def compactBucketed(spark: SparkSession, storeDir: String,
      merge: DataFrame => DataFrame, hashCols: Seq[String],
      targetRowsPerBucket: Long = 4096L): Unit = {
    val prev = newestCommitted(spark, s"$storeDir/base", "upto=")
    val run = newestRunAbove(spark, storeDir, prev)
    val deltaIds = committedIds(spark, s"$storeDir/delta", "batch=")
    val upto = (prev.map(_._1).toSeq ++ run.map(_._1) ++
      deltaIds.map(_._1).maxOption).maxOption match {
      case None => return
      case Some(u) if prev.exists(_._1 == u) => return
      case Some(u) => u
    }
    val folded = readFolded(spark, storeDir, merge).get
    writeBucketedSnapshot(spark, folded, s"$storeDir/base/upto=$upto",
      hashCols, targetRowsPerBucket)
    // same grace discipline as compact
    prev.foreach { case (prevUpto, _) =>
      graceBelow(spark, storeDir, prevUpto, deltaIds) }
  }

  /** The shared grace deletion of a MAJOR compact: everything the
    * PREVIOUS base had already superseded goes (deltas and L1 runs at
    * or below its upto, older bases below it); anything superseded only
    * by the flip that just happened survives one more round for lazy
    * readers.
    */
  private def graceBelow(spark: SparkSession, storeDir: String,
      prevUpto: Long, deltaIds: Seq[(Long, String)]): Unit = {
    val fs = new Path(storeDir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    deltaIds.filter(_._1 <= prevUpto)
      .foreach { case (id, _) =>
        fs.delete(new Path(s"$storeDir/delta/batch=$id"), true) }
    committedIds(spark, s"$storeDir/l1", "upto=")
      .filter(_._1 <= prevUpto)
      .foreach { case (_, p) => fs.delete(new Path(p), true) }
    committedIds(spark, s"$storeDir/base", "upto=")
      .filter(_._1 < prevUpto)
      .foreach { case (_, p) => fs.delete(new Path(p), true) }
  }

  /** MINOR compaction — the O(tail) LSM step between [[compactBucketed]]
    * majors: fold the committed delta tail (plus the previous L1 run,
    * which the new run supersedes) into ONE bucketed `l1/upto=<id>` run.
    * Work is proportional to the rows ingested since the last MAJOR
    * compact, never to the corpus — so a cadence of minors keeps the
    * per-read delta fan-in at one run + a few deltas while the
    * corpus-proportional major runs only when the store has genuinely
    * outgrown its bucket count ([[IncrementalDedup.maybeCompactStores]]).
    * Requires the store's merge to be an associative re-foldable
    * aggregate — the existing DeltaLog contract (base ∪ tail already
    * folds through the same merge at every read).
    *
    * Grace: deltas the PREVIOUS run had folded (≤ its upto) and runs
    * that previous run superseded go now; the previous run itself
    * survives this round for lazy readers and goes at the next minor.
    */
  def compactMinor(spark: SparkSession, storeDir: String,
      merge: DataFrame => DataFrame, hashCols: Seq[String],
      targetRowsPerBucket: Long = 4096L): Unit = {
    val base = newestCommitted(spark, s"$storeDir/base", "upto=")
    val prevRun = newestRunAbove(spark, storeDir, base)
    val prevFloor = (base.map(_._1).toSeq ++ prevRun.map(_._1)).maxOption
    val deltaIds = committedIds(spark, s"$storeDir/delta", "batch=")
    val tail = deltaIds.filter { case (id, _) => prevFloor.forall(id > _) }
    if (tail.isEmpty) return
    val upto = tail.map(_._1).max
    val tailDf = spark.read.parquet(tail.map { case (id, _) =>
      s"$storeDir/delta/batch=$id" }: _*)
    val folded = merge((prevRun.map { case (_, p) =>
      spark.read.parquet(p).drop(BucketCol) }.toSeq :+ tailDf)
      .reduce(_ unionByName _))
    writeBucketedSnapshot(spark, folded, s"$storeDir/l1/upto=$upto",
      hashCols, targetRowsPerBucket)
    val fs = new Path(storeDir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    prevFloor.foreach { pf =>
      deltaIds.filter(_._1 <= pf).foreach { case (id, _) =>
        fs.delete(new Path(s"$storeDir/delta/batch=$id"), true) }
      val keep = Set(upto) ++ prevRun.map(_._1)
      committedIds(spark, s"$storeDir/l1", "upto=")
        .filter { case (id, _) => id <= pf && !keep.contains(id) }
        .foreach { case (_, p) => fs.delete(new Path(p), true) }
    }
  }

  /** The folded state RESTRICTED to the hash buckets `probe` touches —
    * the per-batch lookup read. Deltas above the base fold in full
    * (each is O(one batch)); the corpus-scale BASE is partition-pruned
    * to the probe's `ubkt` set, so the read is O(probe-buckets x
    * rows-per-bucket), held constant by [[compactBucketed]]'s scaled
    * bucket count. EXACT for merges that are per-key folds over
    * `hashCols` (sum-by-unit, max-by-key …): every row of a probed key
    * lives in that key's bucket, so the pruned fold equals the full
    * fold restricted to the probe's keys; rows of foreign keys sharing
    * a bucket ride along and stay join-inert downstream. Falls back to
    * the full-relation fold when the base is unbucketed.
    */
  /** Parse a snapshot dir's `_NBUCKETS` marker: first line is the
    * bucket count (the whole pre-r19 format), an optional `rows=<n>`
    * line carries the snapshot's row count (so growth-triggered
    * compaction decisions, [[IncrementalDedup.maybeCompactStores]],
    * cost marker reads, not Spark jobs). None = unbucketed dir.
    */
  private[graft] def markerAt(spark: SparkSession,
      path: String): Option[(Int, Option[Long])] = {
    val fs = new Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())
    try {
      val in = fs.open(new Path(path, BucketsMarker))
      val raw =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      val lines = raw.linesIterator.map(_.trim).filter(_.nonEmpty).toSeq
      lines.headOption.flatMap(_.toIntOption).filter(_ > 0).map { b =>
        b -> lines.collectFirst {
          case l if l.startsWith("rows=") => l.stripPrefix("rows=") }
          .flatMap(_.toLongOption)
      }
      // IO failures only (a missing marker is the normal "unbucketed"
      // answer; a transient read error degrades the same way — full
      // reads, slower, never wrong). Fatal errors (OOM, interrupt)
      // must propagate, not read as "unbucketed" (ADVICE r19).
    } catch { case _: java.io.IOException => None }
  }

  /** Repair a committed snapshot dir whose `_NBUCKETS` marker is
    * missing (a crash between the parquet commit and the marker write)
    * or row-less (the pre-r19 format): recount the rows (a
    * footer-only count) and rewrite the marker in place — the DATA is
    * never touched, so a crash mid-repair just leaves the marker
    * missing again. Without the repair, growth triggers reading the
    * marker ([[IncrementalDedup.maybeCompactStores]]) would fire a
    * major that NO-OPS (nothing newer than the base) while reporting
    * fired=true on every tick (ADVICE r19).
    *
    * The bucket count is kept from a row-less marker when one exists;
    * for a marker-less dir it is recomputed from the recounted rows
    * with the caller's `targetRowsPerBucket` (the same formula the
    * crashed compact used) and then VERIFIED against the data — every
    * row's recomputed bucket id must equal its `ubkt` dir, else the
    * original write used a different target and pinning the guess
    * would make pruned reads silently MISS rows. A failed verification
    * (or an unbucketed legacy dir) writes nothing: full-relation
    * reads, slower, never wrong. Returns whether a complete marker is
    * now in place.
    */
  private[graft] def repairMarker(spark: SparkSession, path: String,
      hashCols: Seq[String], targetRowsPerBucket: Long): Boolean = {
    val df = spark.read.parquet(path)
    if (!df.columns.contains(BucketCol)) return false // legacy unbucketed
    val n = df.count()
    val b = markerAt(spark, path).map(_._1).getOrElse {
      val guess = math.max(1L,
        (n + targetRowsPerBucket - 1) / targetRowsPerBucket)
        .min(1L << 20).toInt
      val mismatched = df.filter(
        bucketExpr(hashCols, guess) =!= org.apache.spark.sql.functions
          .col(BucketCol)).limit(1).count()
      if (mismatched > 0) return false
      guess
    }
    val fs = new Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val out = fs.create(new Path(path, BucketsMarker), true)
    try out.write(s"$b\nrows=$n".getBytes("UTF-8")) finally out.close()
    true
  }

  /** The newest base snapshot's pinned bucket count, or None for an
    * unbucketed (or empty) store.
    */
  private[graft] def readBucketCount(spark: SparkSession,
      storeDir: String): Option[Int] =
    newestCommitted(spark, s"$storeDir/base", "upto=")
      .flatMap { case (_, p) => markerAt(spark, p).map(_._1) }

  def readFoldedFor(spark: SparkSession, storeDir: String,
      merge: DataFrame => DataFrame, hashCols: Seq[String],
      probe: DataFrame): Option[DataFrame] = {
    val base = newestCommitted(spark, s"$storeDir/base", "upto=")
    val run = newestRunAbove(spark, storeDir, base)
    if (base.isEmpty && run.isEmpty)
      return readFolded(spark, storeDir, merge) // delta-only store
    // probe bucket ids are per BUCKET COUNT (base and run each pin
    // their own); memoized so two snapshots with equal counts collect
    // the probe once
    val idCache = scala.collection.mutable.Map.empty[Int, Seq[Int]]
    def probeIds(b: Int): Seq[Int] = idCache.getOrElseUpdate(b,
      probe.select(bucketExpr(hashCols, b).as("_b"))
        .distinct().collect().map(_.getInt(0)).toSeq)
    // Touched `ubkt=` dirs read DIRECTLY as roots — measured (r19,
    // x100 base, 7813 buckets of 256 rows): explicit roots 3.6 s at
    // 2000 touched vs 11.5 s for an isin filter over the base root
    // and 17.9 s for a whole-root scan — per-dir overhead dominates
    // tiny-bucket bases however they are read, and explicit roots
    // touch the fewest dirs. Existence is resolved with ONE listing
    // of the snapshot dir (object stores: one paged LIST) rather than
    // one exists() round-trip per candidate dir; the full read when
    // the probe touches essentially everything, or the dir carries no
    // bucket marker (pre-bucketed store, or a crash between the
    // parquet commit and the marker write) — slower, never wrong.
    def readDir(path: String): DataFrame = markerAt(spark, path) match {
      case None => spark.read.parquet(path).drop(BucketCol)
      case Some((b, _)) =>
        val ids = probeIds(b)
        if (ids.size.toLong * 10 >= b.toLong * 9)
          return spark.read.parquet(path).drop(BucketCol)
        val fs = new Path(path)
          .getFileSystem(spark.sessionState.newHadoopConf())
        // a FAILED listing must degrade to the full read, never to "no
        // buckets present" — collapsing a transient list error to an
        // empty set would return an empty relation for a populated
        // snapshot (the silent-stale shape the r18 advice flagged in
        // the commit seam); if the dir truly vanished the full read
        // fails loudly instead
        val present: Option[Set[String]] =
          try Some(fs.listStatus(new Path(path)).toSeq
            .filter(_.isDirectory).map(_.getPath.getName)
            .filter(_.startsWith(s"$BucketCol=")).toSet)
          catch { case _: Throwable => None }
        present match {
          case None => spark.read.parquet(path).drop(BucketCol)
          case Some(have) =>
            val paths = ids.sorted.map(i => s"$BucketCol=$i")
              .filter(have).map(n => s"$path/$n")
            if (paths.isEmpty)
              spark.read.parquet(path).drop(BucketCol)
                .filter(org.apache.spark.sql.functions.lit(false))
            else spark.read.parquet(paths: _*)
        }
    }
    val floor = (base.map(_._1).toSeq ++ run.map(_._1)).maxOption
    val deltas = committedIds(spark, s"$storeDir/delta", "batch=")
      .filter { case (id, _) => floor.forall(id > _) }
      .map { case (id, _) => s"$storeDir/delta/batch=$id" }
    val srcs = (base.toSeq ++ run.toSeq).map { case (_, p) => readDir(p) } ++
      (if (deltas.isEmpty) Nil else Seq(spark.read.parquet(deltas: _*)))
    // same single-snapshot rule as readFolded: one pruned base or run
    // with no tail needs no re-merge
    if (deltas.isEmpty && srcs.size <= 1) srcs.headOption
    else srcs.reduceOption(_ unionByName _).map(merge)
  }

  /** Fold the whole log into one fresh base snapshot. Grace discipline
    * (the [[KeyedUpsertSink]] one-generation window): deletes only what
    * the PREVIOUS compact had already superseded, so a reader's lazy
    * frame resolved just before this flip still finds its files for one
    * more compaction round. No-op on an empty store or when nothing is
    * newer than the current base (folding again would Overwrite the
    * very snapshot a lazy fold is reading from).
    */
  def compact(spark: SparkSession, storeDir: String,
      merge: DataFrame => DataFrame): Unit = {
    val prev = newestCommitted(spark, s"$storeDir/base", "upto=")
    val run = newestRunAbove(spark, storeDir, prev)
    val deltaIds = committedIds(spark, s"$storeDir/delta", "batch=")
    val upto = (prev.map(_._1).toSeq ++ run.map(_._1) ++
      deltaIds.map(_._1).maxOption).maxOption match {
      case None => return
      case Some(u) if prev.exists(_._1 == u) => return
      case Some(u) => u
    }
    readFolded(spark, storeDir, merge).get
      .write.mode(SaveMode.Overwrite).parquet(s"$storeDir/base/upto=$upto")
    prev.foreach { case (prevUpto, _) =>
      graceBelow(spark, storeDir, prevUpto, deltaIds) }
  }

  /** Write-once parameter pin (ADVICE r15): stores whose READ-side math
    * must match the WRITE-side's (CMS depth/width, HLL p, Bloom
    * bits/hashes) record those parameters in a `_PARAMS` file at first
    * write; every later write and parameterized read requires equality.
    * Without the pin, a mismatched read silently mis-addresses cells —
    * the in-relation guards catch a SMALLER read-side parameter (ranks /
    * rows out of range) but can never see a LARGER one (all addresses in
    * range, estimates silently wrong: cms_count 0 for seen values,
    * violating the one-sided error contracts).
    */
  def pinParams(spark: SparkSession, storeDir: String,
      params: Map[String, String]): Unit = {
    val fs = new Path(storeDir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val p = new Path(storeDir, "_PARAMS")
    // sentinel-terminated, written ONCE by exclusive create — no rename
    // anywhere in the pin (the last one left in a store commit path was
    // here; on object stores rename is a tearable copy-then-delete,
    // while the put of a new key is atomic). A file without the
    // sentinel is a torn creation-time crash: the store held nothing
    // but that torn write, so the next pinner repairs it in place.
    // Pre-sentinel files (earlier layouts, written via atomic local
    // rename — necessarily complete) parse as-is.
    val body = params.toSeq.sorted.map { case (k, v) => s"$k=$v" }
      .mkString("\n") + ParamsSentinel
    def writeOnce(): Boolean =
      try {
        fs.mkdirs(new Path(storeDir))
        val out = fs.create(p, false)
        try out.write(body.getBytes("UTF-8")) finally out.close()
        true
      } catch { case _: java.io.IOException => false } // exists/raced
    readParamsChecked(spark, storeDir) match {
      case Right(Some(have)) =>
        require(have == params,
          s"store at $storeDir was built with parameters $have but this " +
            s"call carries $params — sketch addresses would not line up")
      case Right(None) =>
        if (!writeOnce()) {
          // lost a creation race — the winner's pin must match ours
          val have = readParams(spark, storeDir)
          require(have.contains(params),
            s"store at $storeDir was pinned concurrently with " +
              s"${have.getOrElse("a torn file")} but this call carries " +
              s"$params")
        }
      case Left(_) => // torn pin from a crashed creation — repair
        try fs.delete(p, false) catch { case _: Throwable => () }
        if (!writeOnce()) {
          val have = readParams(spark, storeDir)
          require(have.contains(params),
            s"store at $storeDir held a torn _PARAMS and the repair " +
              s"raced a writer pinning ${have.getOrElse("?")}; this " +
              s"call carries $params")
        }
    }
  }

  private val ParamsSentinel = "\n#end"

  /** The pinned parameters, or None for a store that predates the pin
    * (or has no parameterized math). A torn pin throws — parameterized
    * reads must never silently treat a corrupt pin as "unpinned".
    */
  def readParams(spark: SparkSession,
      storeDir: String): Option[Map[String, String]] =
    readParamsChecked(spark, storeDir) match {
      case Right(v) => v
      case Left(raw) => throw new IllegalStateException(
        s"corrupt _PARAMS at $storeDir (torn creation-time write): " +
          raw.take(120))
    }

  /** Right(None) = no pin; Right(Some) = committed pin; Left(raw) =
    * torn sentinel-era file (incomplete upload).
    */
  private def readParamsChecked(spark: SparkSession, storeDir: String)
      : Either[String, Option[Map[String, String]]] = {
    val p = new Path(storeDir, "_PARAMS")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) Right(None)
    else {
      val in = fs.open(p)
      val raw =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      // an EMPTY file is always torn (a crash between the exclusive
      // create and the write — no layout ever wrote an empty pin), and
      // without this it would parse as a complete empty map and wedge
      // every later pin on the equality requirement (ADVICE r18). A
      // sentinel-less NON-empty file is the pre-sentinel layout
      // (written via atomic local rename, necessarily complete); the
      // residual — a sentinel-era tear cut exactly at a value boundary
      // — parses but then fails the equality requirement loudly at the
      // next pin or read check, never silently mis-addresses.
      if (raw.isEmpty) Left(raw)
      else {
        val bodyText =
          if (raw.endsWith(ParamsSentinel))
            raw.dropRight(ParamsSentinel.length)
          else raw
        val parsed = scala.util.Try {
          bodyText.linesIterator.filter(_.nonEmpty).map { l =>
            val Array(k, v) = l.split("=", 2); k -> v
          }.toMap
        }
        parsed.toOption match {
          case Some(m) => Right(Some(m))
          case None => Left(raw)
        }
      }
    }
  }

  /** Read-side validation against the pin: a pinned store must match; an
    * unpinned store (pre-pin layout) passes — the in-relation guards
    * still cover the smaller-parameter direction there.
    */
  def checkParams(spark: SparkSession, storeDir: String,
      params: Map[String, String]): Unit =
    readParams(spark, storeDir).foreach { have =>
      require(have == params,
        s"store at $storeDir was built with parameters $have but this " +
          s"read carries $params — sketch addresses would not line up")
    }

  /** `_SUCCESS`-committed `(id, path)` children of `dir` named
    * `<prefix><long>`.
    */
  def committedIds(spark: SparkSession, dir: String,
      prefix: String): Seq[(Long, String)] = {
    val base = new Path(dir)
    val fs = base.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(base)) return Seq.empty
    fs.listStatus(base).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith(prefix))
      .flatMap { st =>
        st.getPath.getName.stripPrefix(prefix).toLongOption
          .filter(_ => fs.exists(new Path(st.getPath, "_SUCCESS")))
          .map(_ -> st.getPath.toString)
      }
  }

  def newestCommitted(spark: SparkSession, dir: String,
      prefix: String): Option[(Long, String)] =
    committedIds(spark, dir, prefix).maxByOption(_._1)
}
