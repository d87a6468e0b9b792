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
private[operators] object DeltaLog {

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
      .orElse(newestCommitted(spark, s"$storeDir/base", "upto="))
    existing.foreach { case (_, p) =>
      val have = spark.read.parquet(p).schema
        .map(f => f.name -> f.dataType).toMap
      val incoming = delta.schema.map(f => f.name -> f.dataType).toMap
      require(have == incoming,
        s"DeltaLog at $storeDir holds schema $have but this delta carries " +
          s"$incoming — two different stores pointed at one dir?")
    }
    delta.write.mode(SaveMode.Overwrite)
      .parquet(s"$storeDir/delta/batch=$batchId")
  }

  /** The folded state as of the last committed batch: newest committed
    * base snapshot + every committed delta above it, merged by the
    * store's own aggregate. None before the first ingest.
    */
  def readFolded(spark: SparkSession, storeDir: String,
      merge: DataFrame => DataFrame): Option[DataFrame] = {
    val base = newestCommitted(spark, s"$storeDir/base", "upto=")
    val deltas = committedIds(spark, s"$storeDir/delta", "batch=")
      .filter { case (id, _) => base.forall(id > _._1) }
      .map { case (id, _) => s"$storeDir/delta/batch=$id" }
    val parts = base.map(_._2).toSeq ++ deltas
    if (parts.isEmpty) None
    else Some(merge(spark.read.parquet(parts: _*)))
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
    val deltaIds = committedIds(spark, s"$storeDir/delta", "batch=")
    val newestDelta = deltaIds.map(_._1).maxOption
    val upto = (prev.map(_._1).toSeq ++ newestDelta).maxOption match {
      case None => return
      case Some(u) if prev.exists(_._1 == u) => return
      case Some(u) => u
    }
    readFolded(spark, storeDir, merge).get
      .write.mode(SaveMode.Overwrite).parquet(s"$storeDir/base/upto=$upto")
    prev.foreach { case (prevUpto, _) =>
      val fs = new Path(storeDir)
        .getFileSystem(spark.sessionState.newHadoopConf())
      deltaIds.filter(_._1 <= prevUpto)
        .foreach { case (id, _) =>
          fs.delete(new Path(s"$storeDir/delta/batch=$id"), true) }
      committedIds(spark, s"$storeDir/base", "upto=")
        .filter(_._1 < prevUpto)
        .foreach { case (_, p) => fs.delete(new Path(p), true) }
    }
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
    readParams(spark, storeDir) match {
      case Some(have) =>
        require(have == params,
          s"store at $storeDir was built with parameters $have but this " +
            s"call carries $params — sketch addresses would not line up")
      case None =>
        val fs = new Path(storeDir)
          .getFileSystem(spark.sessionState.newHadoopConf())
        val body = params.toSeq.sorted.map { case (k, v) => s"$k=$v" }
          .mkString("\n")
        // temp + rename so a crash mid-write never leaves a torn pin
        val tmp = new Path(storeDir, "_PARAMS.tmp")
        val out = fs.create(tmp, true)
        try out.write(body.getBytes("UTF-8")) finally out.close()
        fs.rename(tmp, new Path(storeDir, "_PARAMS"))
    }
  }

  /** The pinned parameters, or None for a store that predates the pin
    * (or has no parameterized math).
    */
  def readParams(spark: SparkSession,
      storeDir: String): Option[Map[String, String]] = {
    val p = new Path(storeDir, "_PARAMS")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val lines =
        try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
        finally in.close()
      Some(lines.filter(_.nonEmpty).map { l =>
        val Array(k, v) = l.split("=", 2); k -> v
      }.toMap)
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
