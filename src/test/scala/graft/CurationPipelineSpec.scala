package graft

import graft.functions.TextAnalysis
import graft.operators.{CorpusSelect, CurationPipeline, Dedup, SequencePack}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end curation pipeline: every stage's planted signal must be
  * handled by exactly the stage that owns it, the composed run must
  * equal chaining the public stage operators by hand, and the packing
  * must be a per-split running sum over surviving docs.
  */
class CurationPipelineSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val stops = Seq("the", "and", "of", "to", "in", "is")

  /** ~36-token 4-sentence body: unique content words per seed, every
    * third token an English stopword (passes the en/quality gates,
    * fails none of the repetition gates).
    */
  private def mkBody(seed: Int): String =
    (0 until 36).map { i =>
      if (i % 3 == 2) stops((seed + i) % 6) else s"word${seed}x$i"
    }.grouped(9).map(_.mkString(" ")).mkString(". ") + "."

  private def wrap(id: Long, body: String): String =
    s"<html><head><script>var x = 1 < 2;</script></head><body>" +
      s"<h1>Doc $id</h1><!-- junk --><p>$body</p>" +
      (if (id % 4 == 0) s"<p>Limited offer $id. Limited offer $id.</p>"
       else "") +
      "<p>Join our mailing list today.</p></body></html>"

  /** Docs 1-4 and 6: distinct quality bodies; 5: near-dup of 1;
    * 9: too short (gated out).
    */
  private def corpus = (Seq(1L, 2L, 3L, 4L, 6L)
    .map(i => (i, wrap(i, mkBody(i.toInt)))) ++
    Seq((5L, wrap(5L, mkBody(1) + " extra near dup tokens here.")),
      (9L, wrap(9L, "tiny."))))
    .toDF("doc_id", "html")

  test("each planted signal is removed by exactly its stage") {
    val st = CurationPipeline.stages(corpus)
    val extracted = st.extracted.as[(Long, String)].collect().toMap
    // extraction: markup, script content, and comments gone
    assert(extracted.values.forall(t => !t.contains("<") &&
      !t.contains("var x") && !t.contains("junk")))
    assert(extracted(1L).startsWith("Doc 1 word1x0"))
    // gates: the 9-token doc is dropped, everything else survives
    assert(st.curated.select("doc_id").as[Long].collect().sorted.toSeq ==
      Seq(1L, 2L, 3L, 4L, 5L, 6L))
    // boilerplate: the corpus-wide sentence vanishes from every doc,
    // but the per-doc planted repeat is untouched (df = 1)
    val deb = st.deboilered.as[(Long, String)].collect().toMap
    assert(deb.values.forall(!_.contains("Join our mailing list")))
    assert(deb(4L).contains("Limited offer 4. Limited offer 4"))
    // intra-doc: the repeat collapses to one occurrence
    val intra = st.unitDeduped.as[(Long, String)].collect().toMap
    assert("Limited offer 4".r.findAllIn(intra(4L)).size == 1)
    assert(intra(1L).contains("word1x0"))
    // near-dup: 5 clusters with 1 (its copy), keeps representative 1
    val cl = st.clusters.as[(Long, Long)].collect().toMap
    assert(cl(5L) == 1L && cl(1L) == 1L)
    val packedIds = st.packed.select("doc_id").as[Long].collect().toSet
    assert(packedIds == Set(1L, 2L, 3L, 4L, 6L))
    // leakage-safety: the dropped near-dup was ASSIGNED its rep's split
    val splits = st.split.select("doc_id", "split")
      .as[(Long, String)].collect().toMap
    assert(splits(5L) == splits(1L))
  }

  test("packed output is a per-split running sum in doc order") {
    val st = CurationPipeline.stages(corpus)
    val rows = st.packed.as[(Long, String, Long, Long, Long)]
      .collect().groupBy(_._2)
    for ((_, docs) <- rows) {
      var acc = 0L
      for ((_, _, tok, off, bin) <- docs.sortBy(_._1)) {
        assert(off == acc)
        assert(bin == off / 2048)
        acc += tok
      }
    }
  }

  test("composed run equals chaining the public stage operators by hand") {
    val got = CurationPipeline.run(corpus)
      .as[(Long, String, Long, Long, Long)].collect().toSet

    // the same chain, written out the way a user would
    val extracted = corpus.select(col("doc_id"),
      TextAnalysis.htmlToText(col("html")).as("text"))
    val scored = TextAnalysis.withRepetitionStats(
      TextAnalysis.withTextFeatures(extracted))
    val curated = scored
      .join(Dedup.exactDedup(extracted).select(col("kept_id").as("doc_id")),
        Seq("doc_id"), "left_semi")
      .filter(col("quality_score") >= 0.5 && col("lang_pred") === "en" &&
        col("ws_tokens").between(20, 1000) &&
        col("dup_token_frac") <= 0.6 && col("top_bigram_frac") <= 0.2)
      .select(col("doc_id"), col("text"))
    val deb = Dedup.dropBoilerplateUnits(curated, 3L)
      .select(col("doc_id"), col("text_clean").as("text"))
    val intra = Dedup.dedupUnitsWithinDocs(deb)
      .select(col("doc_id"), col("text_clean").as("text"))
    val clusters = Dedup.nearDupClusters(
      Dedup.jaccardPairs(intra, n = 3, threshold = 0.5,
        maxDocFreq = Some(100L)).select("id_a", "id_b"))
    val split = CorpusSelect.leakageSafeSplit(intra, clusters)
    val kept = Dedup.dropNearDups(intra, clusters)
    val want = Seq("train", "val", "test").map { sp =>
      SequencePack.packOffsets(
        TextAnalysis.withTokenCounts(kept)
          .join(split.select("doc_id", "split"), Seq("doc_id"))
          .filter(col("split") === sp)
          .select(col("doc_id"), col("ws_tokens").cast("long").as("ws_tokens")))
        .withColumn("split", lit(sp))
    }.reduce(_ unionByName _)
      .select("doc_id", "split", "ws_tokens", "offset", "bin")
      .as[(Long, String, Long, Long, Long)].collect().toSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("rerun determinism") {
    val a = CurationPipeline.run(corpus)
      .as[(Long, String, Long, Long, Long)].collect().toSet
    val b = CurationPipeline.run(corpus)
      .as[(Long, String, Long, Long, Long)].collect().toSet
    assert(a == b)
  }
}
