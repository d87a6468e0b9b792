package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental weighted EXACT-k sampling — the ingest twin of
  * [[Mixture.weightedSampleK]], closing the selection family's
  * batch/streaming asymmetry the way [[IncrementalDedup]] closes
  * dedup's: a continuously-fed corpus cannot re-rank 100 TB per
  * arriving batch to keep "exactly k docs per group, weight-following"
  * current, but it doesn't have to, because the Efraimidis–Spirakis key
  * is a DETERMINISTIC function of each row alone
  * (`ln((hash60(id)+1)/2^60) / w` — no rand(), the [[Mixture]]
  * discipline) and exact-k selection on per-row keys is MERGEABLE:
  *
  *   topK(A ∪ B) = topK(topK(A) ∪ topK(B))
  *
  * so each batch lands only its own per-group top-k as a delta (≤
  * k·|groups| rows, however large the batch), and the read-side fold
  * re-ranks base + deltas — O(k · |groups| · |log segments|) work for
  * the same rows a full-corpus one-shot re-rank would pick, EXACTLY
  * (IncrementalSampleSpec pins fold == one-shot row-for-row; no
  * reservoir approximation, no skew drift).
  *
  * Ingest contract: disjoint doc-id batches (the [[IncrementalDedup]]
  * contract); re-delivery of a batch under the same id rewrites equal
  * bytes ([[DeltaLog]] Overwrite idempotence). Store layout, `_SUCCESS`
  * gating, and grace-windowed compaction are [[DeltaLog]]'s; this
  * store's merge is rank re-selection.
  */
object IncrementalSample {

  /** One batch's delta: its own per-group weighted top-k, with id,
    * group, and weight carried so the read-side fold can recompute the
    * deterministic E-S key. Extra payload columns ride along untouched.
    */
  def sampleDelta(batch: DataFrame, groupCol: String, idCol: String,
      weightCol: String, k: Int): DataFrame =
    Mixture.weightedSampleK(batch, groupCol, idCol, weightCol, k)

  private def merge(groupCol: String, idCol: String, weightCol: String,
      k: Int): DataFrame => DataFrame =
    // dropDuplicates first: if the disjoint-batch contract is ever
    // violated (one id delivered under two batch ids), the duplicate
    // rows share one deterministic E-S key and would otherwise occupy
    // two top-k slots. The folded set is only k·|groups|·|segments|
    // rows, so the dedup is cheap — and it makes the merge IDEMPOTENT
    // like the HLL max, removing the disjointness contract entirely
    // (ADVICE r14).
    folded => Mixture.weightedSampleK(
      folded.dropDuplicates(groupCol, idCol), groupCol, idCol, weightCol, k)

  /** Land a batch's top-k delta under its own id. */
  def updateStore(storeDir: String, batchId: Long, batch: DataFrame,
      groupCol: String, idCol: String, weightCol: String, k: Int): Unit =
    DeltaLog.writeDelta(
      sampleDelta(batch, groupCol, idCol, weightCol, k), storeDir, batchId)

  /** The corpus-wide exact-k sample as of the last committed batch:
    * one re-rank over base + newer deltas. None before the first
    * ingest. Equals `Mixture.weightedSampleK` over everything ingested
    * so far, row-for-row.
    */
  def readSample(spark: SparkSession, storeDir: String, groupCol: String,
      idCol: String, weightCol: String, k: Int): Option[DataFrame] =
    DeltaLog.readFolded(spark, storeDir, merge(groupCol, idCol, weightCol, k))

  /** Fold the log into one fresh ≤ k·|groups|-row base snapshot — for
    * this store compaction also SHRINKS the read set to its final size,
    * since merged losers are dropped for good (rank selection is
    * monotone: once out of the top k, a row can never re-enter).
    */
  def compact(spark: SparkSession, storeDir: String, groupCol: String,
      idCol: String, weightCol: String, k: Int): Unit =
    DeltaLog.compact(spark, storeDir, merge(groupCol, idCol, weightCol, k))

  /** foreachBatch adapter: fold every micro-batch's top-k delta. */
  def sink(storeDir: String, groupCol: String, idCol: String,
      weightCol: String, k: Int): (DataFrame, Long) => Unit =
    (batch, id) => updateStore(storeDir, id, batch, groupCol, idCol,
      weightCol, k)
}
