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

  test("weightedSampleK: exactly k per group, weight-monotone inclusion") {
    // two groups, heavy-tailed weights: ids 0..199 in gA with weight
    // (id+1), ids 1000..1199 in gB with uniform weight
    val docs = ((0L until 200L).map(i => (i, "gA", i + 1)) ++
      (1000L until 1200L).map(i => (i, "gB", 50L))).toDF("id", "g", "w")
    val got = Mixture.weightedSampleK(docs, "g", "id", "w", k = 25)
      .select("g", "id").as[(String, Long)].collect()
    assert(got.count(_._1 == "gA") == 25 && got.count(_._1 == "gB") == 25)
    // determinism: identical sample on rerun
    val again = Mixture.weightedSampleK(docs, "g", "id", "w", k = 25)
      .select("g", "id").as[(String, Long)].collect()
    assert(got.toSet == again.toSet)
    // weight-monotone in expectation: the heavy half of gA (ids >= 100,
    // 75% of total weight) must dominate the sample
    val heavy = got.filter(_._1 == "gA").count(_._2 >= 100L)
    assert(heavy > 25 / 2, s"heavy half underrepresented: $heavy/25")
    // matches a driver-side E-S replay exactly
    def md5hash60(x: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(d.take(15), 16)
    }
    val replay = (0L until 200L).map { i =>
      val h = md5hash60(i.toString)
      (i, math.log((h + 1).toDouble / 1152921504606846976.0) / (i + 1).toDouble)
    }.sortBy { case (id, key) => (-key, id) }.take(25).map(_._1).toSet
    assert(got.filter(_._1 == "gA").map(_._2).toSet == replay)
  }

  test("weightedSampleK: zero/negative weights excluded, k guard") {
    val docs = Seq((1L, "g", 0L), (2L, "g", -3L), (3L, "g", 5L))
      .toDF("id", "g", "w")
    val got = Mixture.weightedSampleK(docs, "g", "id", "w", k = 10)
      .select("id").as[Long].collect().toSet
    assert(got == Set(3L))
    intercept[IllegalArgumentException] {
      Mixture.weightedSampleK(docs, "g", "id", "w", k = 0)
    }
  }
}
