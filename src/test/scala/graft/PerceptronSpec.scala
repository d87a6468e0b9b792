package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Perceptron

class PerceptronSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  // tokens chosen with distinct hash60 % 64 buckets (alpha=59, beta=43,
  // delta=17, zeta=53 — gamma would collide with alpha at 59, which is
  // why it is NOT here); the corpus is linearly separable, so the batch
  // perceptron must converge and then freeze.
  private val docs = Seq(
    (1L, "alpha alpha", "en"),
    (2L, "alpha beta", "en"),
    (3L, "delta delta", "fr"),
    (4L, "delta zeta", "fr")
  ).toDF("doc_id", "text", "lang")

  test("epoch 1 updates from w=0 with every doc a mistake; separable corpus converges and freezes") {
    val h = Perceptron.trainHistory(docs, isPositive = col("lang") === "en",
      dim = 64, epochs = 4).collect()
    val byEpoch = h.groupBy(_.getAs[Long]("epoch"))
    assert(byEpoch.keySet === Set(1L, 2L, 3L, 4L))
    // y·0 <= 0: all 4 docs are epoch-1 mistakes in both engines' rule
    assert(byEpoch(1L).head.getAs[Long]("mistakes") === 4L)
    def w(e: Long): Map[Long, Long] = byEpoch(e)
      .map(r => r.getAs[Long]("bucket") -> r.getAs[Long]("weight")).toMap
    // epoch-1 summed update: alpha 2+1, beta 1, delta -(2+1), zeta -1
    assert(w(1L)(59L) === 3L && w(1L)(43L) === 1L)
    assert(w(1L)(17L) === -3L && w(1L)(53L) === -1L)
    assert(w(1L).values.count(_ != 0L) === 4)
    // epoch 2 scores every doc correctly -> zero mistakes, weights frozen
    (2L to 4L).foreach { e =>
      assert(byEpoch(e).head.getAs[Long]("mistakes") === 0L, s"epoch $e")
      assert(w(e) === w(1L), s"weights must freeze after convergence ($e)")
    }
  }

  test("score applies trained weights; pred = sign with zero negative") {
    val trained = Perceptron.trainHistory(docs,
      isPositive = col("lang") === "en", dim = 64, epochs = 2)
      .filter(col("epoch") === 2)
    val scored = Perceptron.score(docs, trained, dim = 64).collect()
      .map(r => r.getAs[Long]("id") ->
        (r.getAs[Long]("score"), r.getAs[Long]("pred"))).toMap
    assert(scored(1L) === ((6L, 1L)) && scored(2L) === ((4L, 1L)))
    assert(scored(3L) === ((-6L, -1L)) && scored(4L) === ((-4L, -1L)))
  }

  test("featureless docs score 0 and predict negative but never push weights") {
    val withEmpty = docs.union(Seq((5L, "   ", "en")).toDF("doc_id", "text", "lang"))
    val h = Perceptron.trainHistory(withEmpty,
      isPositive = col("lang") === "en", dim = 64, epochs = 2).collect()
    val byEpoch = h.groupBy(_.getAs[Long]("epoch"))
    // doc 5 is a permanent mistake (score 0, y=+1) with no feature rows
    assert(byEpoch(1L).head.getAs[Long]("mistakes") === 5L)
    assert(byEpoch(2L).head.getAs[Long]("mistakes") === 1L)
    // ...but the weight trajectory is identical to the 4-doc corpus
    val w2 = byEpoch(2L)
      .map(r => r.getAs[Long]("bucket") -> r.getAs[Long]("weight")).toMap
    assert(w2(59L) === 3L && w2(17L) === -3L)
    val scored = Perceptron.score(withEmpty,
      Perceptron.trainHistory(withEmpty, isPositive = col("lang") === "en",
        dim = 64, epochs = 2).filter(col("epoch") === 2),
      dim = 64).collect()
      .map(r => r.getAs[Long]("id") ->
        (r.getAs[Long]("score"), r.getAs[Long]("pred"))).toMap
    assert(scored(5L) === ((0L, -1L)))
  }
}
