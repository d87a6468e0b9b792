package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{AsOfJoin, Temporal}

/** SCD2 interval construction: the intervals tile each key's timeline
  * (no gaps, no overlaps), exactly one current row per key, null-ts
  * changes dropped, and a snapshot equals the as-of join against the
  * raw change stream.
  */
class TemporalSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def changes = Seq(
    ("u1", Some(10L), "a"),
    ("u1", Some(20L), "b"),
    ("u1", Some(30L), "c"),
    ("u2", Some(15L), "x"),
    ("u2", None, "dropped") // null ts -> no validity position
  ).toDF("k", "ts", "v")

  test("intervals tile the timeline; exactly one current row per key") {
    val h = Temporal.scd2(changes, Seq("k"), "ts")
      .select("k", "v", "valid_from", "valid_to", "is_current")
      .as[(String, String, Long, Option[Long], Boolean)].collect()
    assert(h.length === 4, "null-ts change must be dropped")
    val u1 = h.filter(_._1 == "u1").sortBy(_._3)
    assert(u1.map(r => (r._2, r._3, r._4)).toSeq ===
      Seq(("a", 10L, Some(20L)), ("b", 20L, Some(30L)), ("c", 30L, None)),
      "each valid_to is the next valid_from (no gap, no overlap)")
    assert(h.count(_._5) === 2 && h.filter(_._5).forall(_._4.isEmpty),
      "one open current interval per key")
  }

  test("reserved output columns on the input fail fast") {
    intercept[IllegalArgumentException] {
      Temporal.scd2(changes.withColumnRenamed("v", "valid_to"), Seq("k"), "ts")
    }
  }

  test("snapshot at an instant equals the as-of join on the raw changes") {
    val at = 22L
    val snap = Temporal.asOfSnapshot(
        Temporal.scd2(changes, Seq("k"), "ts"), lit(at))
      .select("k", "v").as[(String, String)].collect().toSet
    // as-of: probe each key at `at` against the change stream
    val probes = Seq(("u1", at), ("u2", at)).toDF("k", "pts")
    val asof = AsOfJoin.asofBackward(probes, changes.filter(col("ts").isNotNull),
        Seq("k"), "pts", "ts", Seq("v"))
      .filter(col("asof_v").isNotNull)
      .select(col("k"), col("asof_v")).as[(String, String)].collect().toSet
    assert(snap === asof)
    assert(snap === Set(("u1", "b"), ("u2", "x")))
  }
}
