package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

class DedupSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val base = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank"),
    (2L, "the quick brown fox jumps over the lazy dog near the river shore"),
    (3L, "completely different words appear here without any overlap at all"),
    (4L, "the quick brown fox jumps over the lazy dog near the river bank"), // exact dup of 1
    (5L, "numbers and symbols one two three four five six seven eight nine")
  ).toDF("doc_id", "text")

  test("exactDedup groups identical texts, keeps smallest id") {
    val out = Dedup.exactDedup(base).collect()
    assert(out.length === 4)
    val dupGroup = out.find(_.getAs[Long]("n_copies") == 2L).get
    assert(dupGroup.getAs[Long]("kept_id") === 1L)
  }

  test("jaccardPairs finds near and exact dups, not unrelated docs") {
    val pairs = Dedup.jaccardPairs(base, n = 3, threshold = 0.5)
      .select("id_a", "id_b", "jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(pairs.contains((1L, 4L)) && pairs((1L, 4L)) === 1.0)
    assert(pairs.contains((1L, 2L)) && pairs((1L, 2L)) > 0.5)
    assert(pairs.contains((2L, 4L)))
    assert(pairs.size === 3, s"unexpected pairs: $pairs")
  }

  test("jaccardPairs maxDocFreq drops hot shingles before the join") {
    // 'the quick brown'... shingles shared by docs 1,2,4 have df=3; cap=2
    // removes them, so pair (1,2) loses shared shingles and its jaccard
    // drops below threshold, while the exact-dup pair (1,4) still matches
    // on the remaining (df<=2) shingles it shares exclusively.
    val capped = Dedup.jaccardPairs(base, n = 3, threshold = 0.5,
      maxDocFreq = Some(2L))
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val exact = Dedup.jaccardPairs(base, n = 3, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(capped.subsetOf(exact))
    assert(capped.contains((1L, 4L)))
  }

  test("minHashLshPairs surfaces the same dup structure as exact jaccard") {
    val got = Dedup.minHashLshPairs(base, minAgreement = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got.contains((1L, 4L)))
    assert(!got.exists { case (a, b) => a == 3L || b == 3L })
  }

  test("simHashPairs: exact dup at hamming 0; unrelated docs not paired") {
    val pairs = Dedup.simHashPairs(base, maxHamming = 1)
      .select("id_a", "id_b", "hamming").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(pairs((1L, 4L)) === 0)
    assert(!pairs.keySet.exists { case (a, b) => a == 3L || b == 3L })
  }

  test("embeddingNearDups flags identical vectors only, cosine ~ 1") {
    val embs = Seq(
      (1L, Array(1.0f, 0.0f, 2.0f)),
      (2L, Array(1.0f, 0.0f, 2.0f)),
      (3L, Array(-1.0f, 5.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val out = Dedup.embeddingNearDups(embs, threshold = 0.9).collect()
    assert(out.length === 1)
    assert(out.head.getAs[Long]("id_a") === 1L)
    assert(out.head.getAs[Long]("id_b") === 2L)
    assert(math.abs(out.head.getAs[Double]("cosine") - 1.0) < 1e-9)
  }

  test("nearDupClusters collapses transitive chains to one component") {
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L), (8L, 9L), (7L, 9L))
      .toDF("id_a", "id_b")
    val out = Dedup.nearDupClusters(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 5L, 6L -> 5L,
      7L -> 7L, 8L -> 7L, 9L -> 7L))
  }

  test("embeddingNearDupsLsh finds every exact-dup pair brute force finds") {
    val embs = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val dup = embs.select("vec_id", "embedding").unionByName(
      embs.filter($"vec_id" % 25 === 0)
        .select(($"vec_id" + 100000L).as("vec_id"), $"embedding"))
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val brute = pairs(Dedup.embeddingNearDups(dup))
    val lsh = pairs(Dedup.embeddingNearDupsLsh(dup))
    assert(lsh === brute, "identical vectors always share an LSH bucket")
    assert(brute.nonEmpty)
  }
}
