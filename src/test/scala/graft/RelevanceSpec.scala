package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Relevance

/** BM25: hand-computed scores on a tiny corpus, idf ordering (rare term
  * beats common term), tf saturation, and omission of unmatched docs.
  */
class RelevanceSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  // 4 docs, 4 tokens each (equal dl ⇒ length normalization cancels):
  // "cat" appears in 3 docs (common), "owl" in 1 (rare)
  private def corpus = Seq(
    (1L, "cat cat cat dog"),
    (2L, "cat dog dog dog"),
    (3L, "cat owl dog dog"),
    (4L, "fox fox fox fox")
  ).toDF("doc_id", "text")

  private def score(terms: Seq[String]): Map[Long, (Double, Long)] =
    Relevance.bm25(corpus, terms)
      .as[(Long, Double, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap

  test("matches a hand-computed BM25 on a tiny corpus") {
    val out = score(Seq("cat", "owl"))
    // n=4 docs, dl=4 each, avgdl=4 ⇒ the (1 - b + b*dl/avgdl) factor is 1
    def idf(df: Double) = math.log((4.0 - df + 0.5) / (df + 0.5) + 1.0)
    def w(tf: Double, df: Double) = idf(df) * tf * 2.2 / (tf + 1.2)
    val eps = 1e-12
    assert(math.abs(out(1L)._1 - w(3, 3)) < eps)          // cat x3
    assert(math.abs(out(2L)._1 - w(1, 3)) < eps)          // cat x1
    assert(math.abs(out(3L)._1 - (w(1, 3) + w(1, 1))) < eps) // cat + owl
    assert(out(3L)._2 === 2L && out(1L)._2 === 1L)
    assert(!out.contains(4L), "doc matching no term is omitted")
  }

  test("rare term outweighs common term; repetition saturates") {
    val out = score(Seq("cat", "owl"))
    // doc3's single rare owl contributes more than doc2's single common cat
    assert(out(3L)._1 > 2 * out(2L)._1)
    // tf saturation: 3x the term is far less than 3x the score
    assert(out(1L)._1 < 2 * out(2L)._1)
  }
}
