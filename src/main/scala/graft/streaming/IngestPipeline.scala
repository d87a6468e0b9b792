package graft.streaming

import graft.operators.{IncrementalBoilerplate, IncrementalDedup, IncrementalProfile}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.col

/** The COMPOSED ingestion sink a production training-data corpus runs —
  * the end-to-end shape every piece of this library exists for, wired
  * as one `foreachBatch` function over a document stream:
  *
  *  1. CURATE: the caller's filter chain (quality / lang-ID / token
  *     bounds / repetition gates — any `DataFrame => DataFrame`)
  *     prunes the raw batch;
  *  2. LAND: the curated batch persists under `docs/batch=<id>`
  *     (idempotent overwrite — re-delivery rewrites equal bytes);
  *  3. DEDUP AT INGEST: [[IncrementalDedup.ingestBatch]] mines the
  *     batch's near-dup pairs against the PERSISTED corpus signature
  *     store and folds the batch in — O(batch + collisions), never a
  *     corpus rescan; pairs land under `pairs/batch=<id>`;
  *  4. BOILERPLATE STATS AT INGEST: [[IncrementalBoilerplate]] lands
  *     the batch's additive `(unit, df)` delta, so the corpus-wide
  *     document frequency of every sentence/line unit — what the batch
  *     [[graft.operators.CurationPipeline]]'s C4 boilerplate stage
  *     scans the whole corpus for — stays current at O(batch) cost;
  *     [[boilerplateCleanedDocs]] reads the landed corpus against it
  *     and equals the one-shot `Dedup.dropBoilerplateUnits` exactly;
  *  5. PROFILE AT INGEST: [[IncrementalProfile]] folds the batch's
  *     mergeable column summary (counts, typed bounds, HLL distinct
  *     sketch) into the |columns|-row store — statistics stay current
  *     with zero corpus rescans, re-delivery is a marker-guarded no-op.
  *
  * Everything downstream (drop-near-dups, boilerplate cleaning, budget
  * selection, splits) reads the landed relations; nothing here ever
  * scans more than one batch. IngestPipelineSpec proves the composed
  * sink equals the batch-composed one-shot run part by part, and that
  * re-delivering a batch changes nothing.
  */
object IngestPipeline {

  /** The foreachBatch function. `profileCols` must exist on the CURATED
    * batch. Step order matters: land first (so a crash between steps
    * leaves a readable batch and re-delivery repairs the rest), then
    * dedup (which materializes its pairs before touching the signature
    * store), then the marker-guarded profile fold.
    */
  def sink(baseDir: String, curate: DataFrame => DataFrame,
      profileCols: Seq[String]): (DataFrame, Long) => Unit = {
    (batch: DataFrame, batchId: Long) => {
      val curated = curate(batch).localCheckpoint(false)
      // size this batch's shuffles to its VOLUME, not the session
      // default (cores-sized partitions pay per-partition fixed costs
      // that dominate small batches — the measured MicroBatchTuning
      // rule). Safe per-batch here: foreachBatch is stateless, so no
      // checkpoint pins the partition count. The count is a cheap
      // post-checkpoint scan.
      MicroBatchTuning.withBatchVolume(batch.sparkSession, curated.count()) {
        curated.write.mode(SaveMode.Overwrite)
          .parquet(s"$baseDir/docs/batch=$batchId")
        IncrementalDedup.ingestBatch(curated, s"$baseDir/sigs", batchId)
          .write.mode(SaveMode.Overwrite)
          .parquet(s"$baseDir/pairs/batch=$batchId")
        IncrementalBoilerplate.updateStore(s"$baseDir/unitdf", batchId, curated)
        IncrementalProfile.updateStore(s"$baseDir/profile", batchId,
          IncrementalProfile.summarize(curated, profileCols))
      }
    }
  }

  /** The landed corpus with corpus-wide boilerplate units removed —
    * the streaming-side equal of the batch CurationPipeline's
    * boilerplate stage, read at any moment from the unit-df store the
    * sink keeps current (no corpus re-scan to build the df relation:
    * only the rebuild itself touches the docs).
    */
  def boilerplateCleanedDocs(spark: SparkSession, baseDir: String,
      minDocFreq: Long): DataFrame =
    IncrementalBoilerplate.cleanAgainstStore(
      landedDocs(spark, baseDir), s"$baseDir/unitdf", minDocFreq)

  /** The landed corpus read out as the FULL C4-equivalent product —
    * every remaining batch-only stage of
    * [[graft.operators.CurationPipeline]] composed over the relations
    * the sink keeps current, with zero corpus-wide recomputation of
    * anything the stores already hold: boilerplate cleaning against
    * the folded unit-df store, per-doc intra-document unit dedup,
    * near-dup clusters from the incrementally-mined pair log, then the
    * IDENTICAL leakage-safe split + per-split packing code path the
    * batch pipeline runs (`CurationPipeline.splitAndPack`). Output:
    * `(doc_id, split, ws_tokens, offset, bin)` — the packed training
    * sequences. IngestPipelineSpec proves this equals the one-shot
    * batch twin of the same chain over the same raw corpus.
    */
  def c4Corpus(spark: SparkSession, baseDir: String, minDocFreq: Long = 3L,
      binSize: Long = 2048L): DataFrame = {
    val cleaned = boilerplateCleanedDocs(spark, baseDir, minDocFreq)
      .select(col("doc_id"), col("text_clean").as("text"))
    val unitDeduped = graft.operators.Dedup.dedupUnitsWithinDocs(cleaned)
      .select(col("doc_id"), col("text_clean").as("text"))
      .localCheckpoint(false)
    val clusters = graft.operators.Dedup.nearDupClusters(
      minedPairs(spark, baseDir).select("id_a", "id_b"))
    graft.operators.CurationPipeline.splitAndPack(unitDeduped, clusters,
      "doc_id", binSize)
  }

  /** The landed curated corpus (all batches, `batch` partition column). */
  def landedDocs(spark: SparkSession, baseDir: String): DataFrame =
    spark.read.parquet(s"$baseDir/docs")

  /** All near-dup pairs mined so far. */
  def minedPairs(spark: SparkSession, baseDir: String): DataFrame =
    spark.read.parquet(s"$baseDir/pairs")

  /** Current corpus statistics from the profile store. */
  def currentProfile(spark: SparkSession, baseDir: String): Option[DataFrame] =
    IncrementalProfile.readStore(spark, s"$baseDir/profile")
      .map(IncrementalProfile.report)
}
