package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental corpus-wide BOILERPLATE statistics — the unit-document-
  * frequency twin of [[IncrementalDedup]] / [[IncrementalProfile]],
  * closing the last batch/streaming asymmetry: the batch
  * [[CurationPipeline]] runs C4-style boilerplate-unit removal
  * ([[Dedup.dropBoilerplateUnits]]) over the WHOLE corpus, which a
  * continuously-fed corpus cannot re-scan per arriving batch. This
  * store folds each batch's `(unit, df)` contribution once, so the
  * corpus-wide document frequency of every sentence/line unit — the
  * boilerplate signal — stays current at O(batch) cost, and
  * [[Dedup.dropUnitsByDf]] reads the landed corpus against it to
  * produce EXACTLY the one-shot result.
  *
  * Exactness: a document contributes each distinct unit at most once,
  * so over DISJOINT doc-id batches (the ingest contract, same as
  * [[IncrementalDedup]]) document frequencies are ADDITIVE:
  * `df(A ∪ B) = df(A) + df(B)` per unit, exactly — no sketch, no
  * approximation. IncrementalBoilerplateSpec pins fold == one-shot.
  *
  * Layout — a DELTA LOG, not a rewritten snapshot: unlike the
  * |columns|-row profile store, the unit-df relation is |distinct
  * units| rows (corpus-scale), so rewriting a merged snapshot per batch
  * would be O(store) work for an O(batch) question. Instead each batch
  * lands its own delta under `delta/batch=<id>` (idempotent Overwrite:
  * re-delivery rewrites equal bytes — Structured Streaming re-runs a
  * failed micro-batch under the SAME id, so no marker is needed and no
  * crash ordering can double-count), and readers fold
  * `base + newer deltas` with one sum aggregate at read time. A
  * periodic [[compact]] folds the log into a fresh `base/upto=<id>`
  * snapshot — the LSM discipline — keeping the read-side fold bounded
  * by |units| + recent-delta rows. All dirs are `_SUCCESS`-gated on
  * read, so a torn write never reads. Single-writer by design (the
  * foreachBatch model), like every store here.
  */
object IncrementalBoilerplate {

  /** One batch's additive `(unit, df)` contribution. */
  def unitDfDelta(batch: DataFrame, sepRegex: String = "\\.\\s+",
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    Dedup.unitDocFrequencies(batch, sepRegex, idCol, textCol)

  /** Land a batch's delta. Overwrite on the batch's own dir is the
    * whole idempotence story: a re-delivered batch rewrites equal
    * bytes, a torn first attempt has no `_SUCCESS` and never reads.
    */
  def updateStore(storeDir: String, batchId: Long, batch: DataFrame,
      sepRegex: String = "\\.\\s+", idCol: String = "doc_id",
      textCol: String = "text"): Unit =
    unitDfDelta(batch, sepRegex, idCol, textCol)
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$storeDir/delta/batch=$batchId")

  /** The corpus-wide `(unit, df)` relation as of the last committed
    * batch: newest committed base snapshot + every committed delta
    * above it, folded by one sum aggregate. None before the first
    * ingest.
    */
  def readUnitDf(spark: SparkSession, storeDir: String): Option[DataFrame] = {
    val base = newestCommitted(spark, s"$storeDir/base", "upto=")
    val deltas = committedIds(spark, s"$storeDir/delta", "batch=")
      .filter { case (id, _) => base.forall(id > _._1) }
      .map { case (id, _) => s"$storeDir/delta/batch=$id" }
    val parts = base.map(_._2).toSeq ++ deltas
    if (parts.isEmpty) None
    else Some(spark.read.parquet(parts: _*)
      .groupBy("unit").agg(sum("df").as("df")))
  }

  /** Fold the whole log into one fresh base snapshot. Grace discipline
    * (the [[KeyedUpsertSink]] one-generation window): this compact
    * deletes only what the PREVIOUS compact had already superseded
    * (bases and deltas at-or-below the old base's id), so a reader's
    * lazy frame resolved just before this flip still finds its files
    * for one more compaction round. No-op on an empty store.
    */
  def compact(spark: SparkSession, storeDir: String): Unit = {
    val prev = newestCommitted(spark, s"$storeDir/base", "upto=")
    val deltaIds = committedIds(spark, s"$storeDir/delta", "batch=")
    val newestDelta = deltaIds.map(_._1).maxOption
    val upto = (prev.map(_._1).toSeq ++ newestDelta).maxOption match {
      case None => return // nothing ingested yet
      // nothing newer than the current base: folding again would
      // Overwrite the very snapshot the lazy fold is reading from
      case Some(u) if prev.exists(_._1 == u) => return
      case Some(u) => u
    }
    readUnitDf(spark, storeDir).get
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$storeDir/base/upto=$upto")
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

  /** The landed docs cleaned against the store — the streaming-side
    * equal of the batch [[CurationPipeline]]'s boilerplate stage:
    * after all batches fold, this equals
    * `Dedup.dropBoilerplateUnits(corpus, minDocFreq)` row-for-row.
    */
  def cleanAgainstStore(docs: DataFrame, storeDir: String, minDocFreq: Long,
      sepRegex: String = "\\.\\s+", idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val df = readUnitDf(docs.sparkSession, storeDir).getOrElse(
      throw new IllegalStateException(s"empty boilerplate store: $storeDir"))
    Dedup.dropUnitsByDf(docs, df, minDocFreq, sepRegex, idCol, textCol)
  }

  /** foreachBatch adapter: fold every micro-batch's unit-df delta. */
  def sink(storeDir: String, sepRegex: String = "\\.\\s+",
      idCol: String = "doc_id", textCol: String = "text")
      : (DataFrame, Long) => Unit = (batch, id) =>
    updateStore(storeDir, id, batch, sepRegex, idCol, textCol)

  /** `_SUCCESS`-committed `(id, path)` children of `dir` named
    * `<prefix><long>` — the shared listing both store halves gate on.
    */
  private def committedIds(spark: SparkSession, dir: String,
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

  private def newestCommitted(spark: SparkSession, dir: String,
      prefix: String): Option[(Long, String)] =
    committedIds(spark, dir, prefix).maxByOption(_._1)
}
