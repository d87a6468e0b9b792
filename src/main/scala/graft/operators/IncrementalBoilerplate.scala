package graft.operators

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
  * would be O(store) work for an O(batch) question. The log mechanics
  * (per-batch Overwrite idempotence, `_SUCCESS` gating, base+delta
  * fold, grace-windowed compaction) live in the shared [[DeltaLog]];
  * this store's own contribution is the MERGE — one sum aggregate over
  * `(unit, df)` rows.
  */
object IncrementalBoilerplate {

  private val mergeDf: DataFrame => DataFrame =
    _.groupBy("unit").agg(sum("df").as("df"))

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
    DeltaLog.writeDelta(
      unitDfDelta(batch, sepRegex, idCol, textCol), storeDir, batchId)

  /** The corpus-wide `(unit, df)` relation as of the last committed
    * batch: newest committed base snapshot + every committed delta
    * above it, folded by one sum aggregate. None before the first
    * ingest.
    */
  def readUnitDf(spark: SparkSession, storeDir: String): Option[DataFrame] =
    DeltaLog.readFolded(spark, storeDir, mergeDf)

  /** Fold the whole log into one fresh base snapshot, HASH-BUCKETED by
    * unit with the corpus-scaled bucket count
    * ([[DeltaLog.compactBucketed]], r17 verdict item 4) — so
    * [[cleanAgainstStore]]'s per-batch lookup reads O(batch-buckets)
    * rows of the base instead of the whole unit-df relation, at any
    * corpus size. Same grace discipline as before.
    */
  def compact(spark: SparkSession, storeDir: String,
      targetRowsPerBucket: Long = 4096L): Unit =
    DeltaLog.compactBucketed(spark, storeDir, mergeDf, Seq("unit"),
      targetRowsPerBucket)

  /** MINOR compaction ([[DeltaLog.compactMinor]]): fold the delta tail
    * into one bucketed L1 run at O(rows since the last major) cost, so
    * the cadence between corpus-proportional [[compact]]s keeps reads'
    * delta fan-in bounded without paying a base rewrite per tick.
    */
  def compactMinor(spark: SparkSession, storeDir: String,
      targetRowsPerBucket: Long = 4096L): Unit =
    DeltaLog.compactMinor(spark, storeDir, mergeDf, Seq("unit"),
      targetRowsPerBucket)

  /** The landed docs cleaned against the store — the streaming-side
    * equal of the batch [[CurationPipeline]]'s boilerplate stage:
    * after all batches fold, this equals
    * `Dedup.dropBoilerplateUnits(corpus, minDocFreq)` row-for-row.
    */
  def cleanAgainstStore(docs: DataFrame, storeDir: String, minDocFreq: Long,
      sepRegex: String = "\\.\\s+", idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    // the drop join only consults df values for the BATCH's own units,
    // so the corpus-scale base is bucket-pruned to those units' hash
    // buckets (full-fold fallback on an unbucketed base) — identical
    // output, O(batch-buckets) read instead of O(corpus units)
    // the probe needs DISTINCT units only — skip unitDocFrequencies'
    // df aggregate (the split+explode still runs twice, once here and
    // once inside dropUnitsByDf; both are O(batch) map-side passes)
    val units = Dedup.docUnits(docs, sepRegex, idCol, textCol)
      .select("unit").distinct()
    val df = DeltaLog.readFoldedFor(docs.sparkSession, storeDir, mergeDf,
      Seq("unit"), units).getOrElse(
      throw new IllegalStateException(s"empty boilerplate store: $storeDir"))
    Dedup.dropUnitsByDf(docs, df, minDocFreq, sepRegex, idCol, textCol)
  }

  /** foreachBatch adapter: fold every micro-batch's unit-df delta. */
  def sink(storeDir: String, sepRegex: String = "\\.\\s+",
      idCol: String = "doc_id", textCol: String = "text")
      : (DataFrame, Long) => Unit = (batch, id) =>
    updateStore(storeDir, id, batch, sepRegex, idCol, textCol)
}
