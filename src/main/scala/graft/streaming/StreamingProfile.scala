package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

import graft.operators.Profile

/** Streaming twin of the data-quality pair [[graft.operators.Profile]]
  * `profile`/`drift` — the live monitor that catches a silently nulled
  * column or a collapsed cardinality WHILE a feed is ingesting, not at
  * the nightly diff.
  *
  * Mechanics: a `foreachBatch` sink profiles each micro-batch with the
  * SAME batch operator (one aggregate over the batch — the stream adds
  * no second profiling implementation, exactly like
  * [[StreamingSessionize]]), writes the snapshot under
  * `profileDir/batch=<id>`, and — when a previous snapshot exists —
  * writes `Profile.drift(prev, current)` under `driftDir/batch=<id>`.
  * Per-batch output is idempotent (overwrite by batch id), so Spark's
  * foreachBatch re-delivery cannot duplicate or corrupt a snapshot:
  * re-processing batch N rewrites byte-equivalent content.
  *
  * Everything written is |columns|-sized — the monitor's storage and
  * compute are independent of batch row counts beyond the one profile
  * aggregate, so it rides along any ingest at any scale.
  */
object StreamingProfile {

  /** The foreachBatch function: profile each batch of `cols`, diff
    * against the previous batch's snapshot.
    */
  def monitor(profileDir: String, driftDir: String, cols: Seq[String],
      exactDistinct: Boolean = true): (DataFrame, Long) => Unit = {
    (batch: DataFrame, batchId: Long) => {
      val spark = batch.sparkSession
      Profile.profile(batch, cols, exactDistinct)
        .coalesce(1).write.mode("overwrite")
        .parquet(s"$profileDir/batch=$batchId")
      // Re-read the |cols|-row snapshot just written rather than keep
      // the unevaluated aggregate: using `current` in the drift diff
      // would re-run the whole batch aggregate a second time (notably
      // the exact-distinct Expand). The parquet read costs one tiny
      // file and makes the diff input the exact bytes persisted.
      val current = spark.read.parquet(s"$profileDir/batch=$batchId")
      previousSnapshot(spark, profileDir, batchId).foreach { prev =>
        Profile.drift(prev, current).coalesce(1).write.mode("overwrite")
          .parquet(s"$driftDir/batch=$batchId")
      }
    }
  }

  /** Streaming twin of [[Profile.outliersMad]] — the live anomaly flag
    * (fare spikes, sensor glitches, length-outlier documents) raised
    * per micro-batch instead of at the nightly scan.
    *
    * Same discipline as [[monitor]]: the foreachBatch function runs the
    * SAME batch operator on each micro-batch and writes the flagged rows
    * under `outlierDir/batch=<id>` with overwrite-by-batch-id, so
    * foreachBatch re-delivery rewrites byte-equivalent content and the
    * `_SUCCESS` marker gates out a half-written batch. The median/MAD
    * statistics are computed WITHIN each batch — the monitor flags "this
    * row is anomalous against its cohort in this batch", which needs no
    * cross-batch state and therefore rides any ingest rate in bounded
    * memory (two group-partitioned windows + a broadcastable
    * |groups|-row bounds join, per batch).
    */
  def monitorOutliers(outlierDir: String, group: String, value: String,
      tie: String, k: Int = 3): (DataFrame, Long) => Unit = {
    (batch: DataFrame, batchId: Long) =>
      Profile.outliersMad(batch, group, value, tie, k)
        .coalesce(1).write.mode("overwrite")
        .parquet(s"$outlierDir/batch=$batchId")
  }

  /** Persist the REFERENCE binned distribution [[monitorPsi]] scores
    * batches against — typically the training set's (or a blessed
    * week's) distribution, written once; |bins| rows.
    */
  def writePsiReference(reference: DataFrame, bin: Column,
      refDir: String): Unit =
    Profile.binCounts(reference, bin)
      .coalesce(1).write.mode("overwrite").parquet(refDir)

  /** Streaming twin of [[Profile.psi]]: every micro-batch's binned
    * distribution is scored against the persisted reference (PSI with
    * the same eps floor), one (col_name, n_bins, psi) row landing under
    * `psiDir/batch=<id>`. The production drift alarm: reference = what
    * the model trained on; a batch scoring > 0.25 means the feed no
    * longer looks like the training data. Same idempotent-overwrite
    * discipline as [[monitor]]; per-batch cost is one hash aggregate
    * over the batch plus a |bins|-sized join against a tiny parquet —
    * independent of history length, no cross-batch state.
    */
  def monitorPsi(refDir: String, psiDir: String, bin: Column,
      colName: String, eps: Double = 1e-6): (DataFrame, Long) => Unit = {
    (batch: DataFrame, batchId: Long) => {
      val ref = batch.sparkSession.read.parquet(refDir)
      Profile.psiFromCounts(ref, Profile.binCounts(batch, bin), colName, eps)
        .coalesce(1).write.mode("overwrite")
        .parquet(s"$psiDir/batch=$batchId")
    }
  }

  /** Latest COMMITTED snapshot with id < `batchId`, if any — read by id
    * order, not mtime, so re-delivered batches diff against the same
    * predecessor they did the first time. Hadoop FileSystem listing
    * (not java.io) so the monitor works against HDFS/S3 paths, and the
    * `_SUCCESS` marker gates out a snapshot whose write died mid-flight.
    */
  private[streaming] def previousSnapshot(spark: SparkSession, dir: String,
      batchId: Long): Option[DataFrame] = {
    val base = new Path(dir)
    val fs = base.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(base)) return None
    fs.listStatus(base).toSeq
      .filter(_.isDirectory)
      .flatMap(st => st.getPath.getName.stripPrefix("batch=").toLongOption
        .filter(_ => st.getPath.getName.startsWith("batch="))
        .map(_ -> st.getPath))
      .filter { case (id, p) => id < batchId &&
        fs.exists(new Path(p, "_SUCCESS")) }
      .sortBy(_._1).lastOption
      .map { case (_, p) => spark.read.parquet(p.toString) }
  }
}
