package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{KnnClassify, SimilaritySearch}

/** kNN label vote: planted-cluster assignment over the exact top-k,
  * the (votes, best_rank) tie-break order, and composition — the same
  * vote over a full-recall IVF index equals the brute-force answer.
  */
class KnnClassifySpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  /** Two well-separated direction clusters plus queries near each. */
  private def corpus = {
    val a = (1L to 5L).map(i =>
      (i, Array(1.0f, 0.0f, 0.0f, 0.01f * i), "A"))
    val b = (6L to 10L).map(i =>
      (i, Array(0.0f, 1.0f, 0.0f, 0.01f * i), "B"))
    (a ++ b).toDF("vec_id", "embedding", "label")
  }

  private def queries = Seq(
    (100L, Array(0.9f, 0.1f, 0.0f, 0.0f)), // near cluster A
    (200L, Array(0.1f, 0.9f, 0.0f, 0.0f)) // near cluster B
  ).toDF("vec_id", "embedding")

  test("planted clusters get their cluster's label") {
    val got = KnnClassify.vote(
        SimilaritySearch.bruteForceTopK(corpus, queries, k = 5),
        corpus, "vec_id", "label")
      .select("query_id", "label", "votes")
      .as[(Long, String, Long)].collect().toSet
    assert(got === Set((100L, "A", 5L), (200L, "B", 5L)))
  }

  test("vote tie falls to the label with the closer best neighbor") {
    // ranks: B=1, A=2, A=3, B=4 -> 2 votes each; B's best_rank=1 wins
    val neighbors = Seq(
      (1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3), (1L, 13L, 4))
      .toDF("query_id", "neighbor_id", "rank")
    val labels = Seq((10L, "B"), (11L, "A"), (12L, "A"), (13L, "B"))
      .toDF("id", "lbl")
    val got = KnnClassify.vote(neighbors, labels, "id", "lbl")
      .select("query_id", "label", "votes", "best_rank")
      .as[(Long, String, Long, Int)].collect().toSeq
    assert(got === Seq((1L, "B", 2L, 1)))
  }

  test("composes: vote over full-recall IVF == vote over brute force") {
    // nprobe == numCentroids -> every cell probed -> exact retrieval
    val overIvf = KnnClassify.vote(
        SimilaritySearch.ivfTopK(corpus, queries, k = 5,
          numCentroids = 3, nprobe = 3),
        corpus, "vec_id", "label")
      .select("query_id", "label", "votes", "best_rank")
      .as[(Long, String, Long, Int)].collect().toSet
    val overExact = KnnClassify.vote(
        SimilaritySearch.bruteForceTopK(corpus, queries, k = 5),
        corpus, "vec_id", "label")
      .select("query_id", "label", "votes", "best_rank")
      .as[(Long, String, Long, Int)].collect().toSet
    assert(overIvf === overExact)
  }
}
