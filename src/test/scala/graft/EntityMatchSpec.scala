package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.EntityMatch

/** Fuzzy record linkage: hand-checked neighborhood cases (substitution,
  * insertion, deletion, identical, just-too-far), then the load-bearing
  * property — deletion-neighborhood blocking returns EXACTLY the pair
  * set the naive all-pairs join returns, on a corpus engineered for
  * heavy key collisions.
  */
class EntityMatchSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("finds exactly the distance<=1 pairs, including dist-0 twins") {
    val df = Seq(
      (1L, "alpha"), // anchor
      (2L, "alphb"), // substitution        -> dist 1
      (3L, "alpha"), // identical name      -> dist 0
      (4L, "alpha7"), // trailing insertion -> dist 1
      (5L, "lpha"), // leading deletion     -> dist 1
      (6L, "alXYa"), // two substitutions   -> excluded
      (7L, "zzzzz") // unrelated
    ).toDF("id", "name")
    val got = EntityMatch.fuzzyPairs(df, "id", "name")
      .select("id_a", "id_b", "dist").as[(Long, Long, Int)].collect().toSet
    assert(got === Set((1L, 2L, 1), (1L, 3L, 0), (1L, 4L, 1), (1L, 5L, 1),
      (2L, 3L, 1), (3L, 4L, 1), (3L, 5L, 1)))
  }

  test("empty and single-char strings block correctly") {
    val df = Seq((1L, ""), (2L, "a"), (3L, "ab"), (4L, "b"))
      .toDF("id", "name")
    val got = EntityMatch.fuzzyPairs(df, "id", "name")
      .select("id_a", "id_b", "dist").as[(Long, Long, Int)].collect().toSet
    // ""~"a" (1), ""~"b" (1), "a"~"ab" (1), "a"~"b" (1), "ab"~"b" (1);
    // ""~"ab" is dist 2.
    assert(got === Set((1L, 2L, 1), (1L, 4L, 1), (2L, 3L, 1), (2L, 4L, 1),
      (3L, 4L, 1)))
  }

  test("blocked result == naive all-pairs result on a collision-heavy corpus") {
    val rnd = new scala.util.Random(42)
    val alphabet = "abc"
    val rows = (1L to 250L).map { id =>
      val len = 3 + rnd.nextInt(4)
      (id, (0 until len).map(_ => alphabet(rnd.nextInt(3))).mkString)
    }
    val df = rows.toDF("id", "name")
    val blocked = EntityMatch.fuzzyPairs(df, "id", "name")
      .select("id_a", "id_b", "dist").as[(Long, Long, Int)].collect().toSet
    val a = df.select(col("id").as("id_a"), col("name").as("name_a"))
    val b = df.select(col("id").as("id_b"), col("name").as("name_b"))
    val naive = a.crossJoin(b)
      .filter(col("id_a") < col("id_b") &&
        levenshtein(col("name_a"), col("name_b")) <= 1)
      .select(col("id_a"), col("id_b"),
        levenshtein(col("name_a"), col("name_b")).cast("int").as("dist"))
      .as[(Long, Long, Int)].collect().toSet
    assert(blocked === naive)
    assert(naive.nonEmpty, "collision corpus must actually produce pairs")
  }
}
