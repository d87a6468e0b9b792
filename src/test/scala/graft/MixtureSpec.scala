package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Mixture

/** Temperature mixture sampling: exact rate arithmetic, the sqrt
  * flattening property on skewed group sizes, the keep-everything cap,
  * and hash determinism.
  */
class MixtureSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("keep_ppm is floor(scale/sqrt(n)) capped at 1e6") {
    val docs = ((1 to 4).map(i => (s"t$i", "small")) ++
      (1 to 100).map(i => (s"u$i", "big")) ++
      Seq(("lone", "tiny"))).toDF("text", "g")
    val rates = Mixture.temperatureSample(docs, "g", "text", 2000000L)
      .select("g", "keep_ppm").distinct()
      .as[(String, Long)].collect().toMap
    // small: floor(2e6/2) = 1e6 (exactly at cap); tiny: capped
    assert(rates.get("small").forall(_ === 1000000L))
    assert(rates.get("tiny").forall(_ === 1000000L))
    // big: floor(2e6/10) = 200000
    assert(rates.get("big").forall(_ === 200000L))
    // at-cap and capped groups keep EVERY doc
    val kept = Mixture.temperatureSample(docs, "g", "text", 2000000L)
      .groupBy("g").count().as[(String, Long)].collect().toMap
    assert(kept("small") === 4L && kept("tiny") === 1L)
  }

  test("expected counts flatten to sqrt(n) on a skewed corpus") {
    val docs = ((1 to 200).map(i => (s"a_doc_$i", "rare")) ++
      (1 to 1800).map(i => (s"b_doc_$i", "common"))).toDF("text", "g")
    val kept = Mixture.temperatureSample(docs, "g", "text", 5000000L)
      .groupBy("g").count().as[(String, Long)].collect().toMap
    // E[rare] = 200 * 353553ppm ~= 70.7; E[common] = 1800 * 117851 ~= 212
    assert(math.abs(kept("rare") - 70.7) < 25, s"rare kept ${kept("rare")}")
    assert(math.abs(kept("common") - 212.1) < 55,
      s"common kept ${kept("common")}")
    // the flattened ratio is sqrt(1800/200) = 3, not the raw 9
    val ratio = kept("common").toDouble / kept("rare")
    assert(ratio > 1.8 && ratio < 4.5, s"flattened ratio $ratio")
  }

  test("deterministic: identical sample on rerun; guard on scalePpm") {
    val docs = (1 to 500).map(i => (s"doc $i", s"g${i % 3}")).toDF("text", "g")
    def ids() = Mixture.temperatureSample(docs, "g", "text", 900000L)
      .select("text").as[String].collect().toSet
    assert(ids() === ids())
    intercept[IllegalArgumentException] {
      Mixture.temperatureSample(docs, "g", "text", 0L)
    }
  }
}
