package graft

import graft.operators.Dedup
import graft.sources.MediaColumns
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Cross-modal (image, caption) near-dup: each modality's edges catch
  * what the other cannot, the union clusters transitively ACROSS
  * modalities, and one representative pair survives per cluster.
  */
class MultimodalDedupSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  // >= 72 bytes so every payload fingerprints; rising vs falling byte
  // gradients give near-complementary dHashes (far beyond hamming 3)
  private val rising  = (0 until 80).map(i => ('a' + i % 26).toChar).mkString
  private val falling = (0 until 80).map(i => ('z' - i % 26).toChar).mkString
  private val mixed   = (0 until 80).map(i =>
    (if (i % 2 == 0) 'a' + i % 13 else 'z' - i % 11).toChar).mkString

  private val capShared = "totally different words here entirely"

  private def paired(rows: (Long, String, String)*): DataFrame =
    rows.toDF("doc_id", "img", "caption")
      .select(col("doc_id"), encode(col("img"), "UTF-8").as("payload"),
        col("caption"))

  // A,B share an IMAGE (identical bytes) but no caption words;
  // B,C share a CAPTION (verbatim) but opposite image gradients;
  // D is unrelated in both modalities
  private val corpus = paired(
    (1L, rising, "a red car parked outside the old museum"),
    (2L, rising, capShared),
    (3L, falling, capShared),
    (4L, mixed, "the quick brown fox jumps again"))

  test("each modality catches exactly the pair the other misses") {
    val edges = MediaColumns.pairedNearDupEdges(corpus)
      .select("id_a", "id_b", "modality")
      .as[(Long, Long, String)].collect().toSet
    assert(edges == Set((1L, 2L, "image"), (2L, 3L, "caption")))
  }

  test("union CC is transitive across modalities; one pair kept per cluster") {
    // 1~2 by image only, 2~3 by caption only: {1,2,3} must collapse
    // even though 1 and 3 match in NO modality directly
    val kept = MediaColumns.pairedNearDupKept(corpus)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 4L))
  }

  test("either single-modality pass alone under-dedups this corpus") {
    val imgOnly = Dedup.dropNearDups(corpus,
        Dedup.nearDupClusters(MediaColumns.nearDupPairs(corpus)
          .select("id_a", "id_b")))
      .select("doc_id").as[Long].collect().toSet
    val capOnly = Dedup.dropNearDups(corpus,
        Dedup.nearDupClusters(Dedup.jaccardPairs(corpus,
            idCol = "doc_id", textCol = "caption")
          .select("id_a", "id_b")))
      .select("doc_id").as[Long].collect().toSet
    assert(imgOnly == Set(1L, 3L, 4L), "image-only keeps the re-encoded copy")
    assert(capOnly == Set(1L, 2L, 4L), "caption-only keeps the re-captioned copy")
  }

  test("a pair matching in BOTH modalities carries both tagged edge rows") {
    val both = paired(
      (1L, rising, capShared),
      (2L, rising, capShared))
    val edges = MediaColumns.pairedNearDupEdges(both)
      .select("id_a", "id_b", "modality")
      .as[(Long, Long, String)].collect().toSet
    assert(edges == Set((1L, 2L, "image"), (1L, 2L, "caption")))
    assert(MediaColumns.pairedNearDupKept(both)
      .select("doc_id").as[Long].collect().toSeq == Seq(1L))
  }
}
