package graft

import java.nio.file.Files

import graft.functions.TextAnalysis
import graft.operators.{Dedup, IncrementalBoilerplate, Profile}
import graft.streaming.IngestPipeline
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** One row on the streaming ingest feed. */
case class IngestDoc(doc_id: Long, text: String)

/** The composed production ingest sink (curate → land → incremental
  * dedup → incremental profile) must equal its batch-composed one-shot
  * run part by part, and re-delivery must change nothing.
  */
class IngestPipelineSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private val profCols = Seq("doc_id", "ws_tokens")

  // the curate_documents-style chain: quality floor + token bounds
  private def curate(df: DataFrame): DataFrame =
    TextAnalysis.withQualityScore(TextAnalysis.withTokenCounts(df))
      .filter(col("quality_score") >= 0.3 &&
        col("ws_tokens").between(10, 10000))
      .select(col("doc_id"), col("text"), col("ws_tokens").cast("long").as("ws_tokens"))

  // 3 batches: two corpus slices plus near-dup copies of every 20th doc;
  // every 10th doc carries a planted TEMPLATE unit (the boilerplate
  // signal the unit-df store must count corpus-wide across batches)
  private val Template = "Subscribe to our newsletter for free offers"
  private def batches: Seq[Seq[IngestDoc]] = {
    val all = Tables.documents(spark, sf).select("doc_id", "text")
      .as[(Long, String)].collect().map { case (i, t) =>
        IngestDoc(i, if (i % 10 == 0) s"$t. $Template" else t) }
    val dups = all.filter(_.doc_id % 20 == 0)
      .map(d => IngestDoc(d.doc_id + 100000L, d.text + " extradup token"))
    // junk the curation chain must drop: too short / pure punctuation
    val junk = Seq(IngestDoc(900001L, "x"),
      IngestDoc(900002L, "!!! ??? ... ;;; ::: ,,, (( )) [[ ]] {{ }} %% @@"))
    Seq(all.take(250).toSeq :+ junk.head,
      all.drop(250).toSeq, dups.toSeq :+ junk.last)
  }

  test("streamed ingest equals the batch-composed one-shot, part by part") {
    val dir = Files.createTempDirectory("ingest").toString
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[IngestDoc]
    val q = input.toDF().writeStream
      .foreachBatch(IngestPipeline.sink(dir, curate, profCols))
      .option("checkpointLocation", s"$dir/ckpt").start()
    try batches.foreach { b => input.addData(b); q.processAllAvailable() }
    finally q.stop()

    val allRaw = batches.flatten.toDF()
    val curatedAll = curate(allRaw)

    // 1. landed docs == curate(everything)
    val landed = IngestPipeline.landedDocs(spark, dir)
    val landedCount = landed.count()
    assert(landed.select("doc_id").as[Long].collect().sorted.toSeq ==
      curatedAll.select("doc_id").as[Long].collect().sorted.toSeq)
    assert(landedCount > 0 && landedCount < allRaw.count(),
      "curation must actually prune")

    // 2. union of per-batch pairs == one-shot pairs over the curated corpus
    val mined = IngestPipeline.minedPairs(spark, dir)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val oneShot = Dedup.minHashLshPairs(curatedAll)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(mined == oneShot && mined.nonEmpty)

    // 3. profile store == one-shot profile on exact fields
    val stored = IngestPipeline.currentProfile(spark, dir).get
      .select("col_name", "n_non_null", "n_nulls", "min_value", "max_value")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getString(4))).toSet
    val direct = Profile.profile(curatedAll, profCols)
      .select("col_name", "n_non_null", "n_nulls", "min_value", "max_value")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getString(4))).toSet
    assert(stored == direct)

    // 4. boilerplate stage: landed docs cleaned against the folded
    // unit-df store == one-shot dropBoilerplateUnits over the curated
    // corpus — the batch CurationPipeline stage, matched by the stream
    def cleanedSet: Set[(Long, String, Long, Long)] =
      IngestPipeline.boilerplateCleanedDocs(spark, dir, minDocFreq = 3)
        .select("doc_id", "text_clean", "n_units", "n_dropped")
        .as[(Long, String, Long, Long)].collect().toSet
    val cleaned = cleanedSet
    val oneShotClean = Dedup.dropBoilerplateUnits(curatedAll, minDocFreq = 3)
      .select("doc_id", "text_clean", "n_units", "n_dropped")
      .as[(Long, String, Long, Long)].collect().toSet
    assert(cleaned == oneShotClean)
    // the planted template (df >= 3 corpus-wide, even where a batch
    // held fewer than 3 carriers) is gone from every doc
    assert(!cleaned.exists(_._2.contains(Template)))
    assert(cleaned.exists(_._4 > 0), "template units must have dropped")

    // 5. re-delivering the last batch changes nothing anywhere
    IngestPipeline.sink(dir, curate, profCols)(batches.last.toDF(), 2L)
    assert(IngestPipeline.landedDocs(spark, dir).count() == landedCount)
    assert(IngestPipeline.minedPairs(spark, dir)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet == mined)
    assert(IngestPipeline.currentProfile(spark, dir).get
      .select("col_name", "n_non_null", "n_nulls", "min_value", "max_value")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getString(4))).toSet == stored)
    assert(cleanedSet == oneShotClean)

    // 6. compacting the unit-df log changes no answers either
    IncrementalBoilerplate.compact(spark, s"$dir/unitdf")
    assert(cleanedSet == oneShotClean)

    // 7. the FULL read-side C4 chain (boilerplate clean -> intra-doc
    // unit dedup -> near-dup keep from the mined pair log -> leakage-
    // safe split -> per-split packing) == its one-shot batch twin over
    // the same raw corpus, stage generators aligned (LSH pairs over the
    // curated text on both sides)
    val streamedPacked = IngestPipeline.c4Corpus(spark, dir, minDocFreq = 3)
      .select("doc_id", "split", "ws_tokens", "offset", "bin")
      .as[(Long, String, Long, Long, Long)].collect().toSet
    val twinUnitDeduped = Dedup.dedupUnitsWithinDocs(
        Dedup.dropBoilerplateUnits(curatedAll, minDocFreq = 3)
          .select(col("doc_id"), col("text_clean").as("text")))
      .select(col("doc_id"), col("text_clean").as("text"))
    val twinClusters = Dedup.nearDupClusters(
      Dedup.minHashLshPairs(curatedAll).select("id_a", "id_b"))
    val twinPacked = graft.operators.CurationPipeline.splitAndPack(
        twinUnitDeduped, twinClusters, "doc_id", binSize = 2048L)
      .select("doc_id", "split", "ws_tokens", "offset", "bin")
      .as[(Long, String, Long, Long, Long)].collect().toSet
    assert(streamedPacked == twinPacked && streamedPacked.nonEmpty)
  }
}
