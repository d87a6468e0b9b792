package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.RangeJoin

/** Bucketed point-in-interval join: equality with the naive inequality
  * join, multi-bucket interval spans, inclusive bounds, null/empty
  * interval semantics, keyed scoping, and the collision guard.
  */
class RangeJoinSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def pts = Seq(
    (1L, 5L), (2L, 10L), (3L, 17L), (4L, 29L), (5L, 100L), (6L, 31L)
  ).toDF("pid", "pos")

  private def ivals = Seq(
    (10L, 5L, 10L),    // [5,10]   inclusive both ends, same bucket pair
    (11L, 9L, 30L),    // [9,30]   spans 4 buckets at width 8
    (12L, 40L, 35L),   // empty (start > end) -> no rows
    (13L, 98L, 120L)   // catches the far point
  ).toDF("iid", "s", "e")

  test("matches the naive inequality join exactly (several widths)") {
    val naive = pts.join(ivals,
        col("pos") >= col("s") && col("pos") <= col("e"))
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    for (w <- Seq(1L, 3L, 8L, 64L)) {
      val bucketed = RangeJoin.pointInInterval(pts, ivals, "pos", "s", "e",
        bucketWidth = w).select("pid", "iid").as[(Long, Long)].collect().toSet
      assert(bucketed === naive, s"bucketWidth=$w must not change the answer")
    }
    // sanity on the fixture: inclusive ends (5 and 10 both hit [5,10]),
    // the multi-bucket interval catches 10,17,29, the empty one nothing
    assert(naive === Set((1L, 10L), (2L, 10L), (2L, 11L), (3L, 11L),
      (4L, 11L), (5L, 13L)))
  }

  test("null positions and null/empty intervals produce no rows") {
    val p = Seq((Some(1L), Some(5L)), (Some(2L), None))
      .toDF("pid", "pos")
    val i = Seq((Some(10L), Some(1L), Some(9L)), (Some(11L), None, Some(9L)),
      (Some(12L), Some(1L), None)).toDF("iid", "s", "e")
    val out = RangeJoin.pointInInterval(p, i, "pos", "s", "e", bucketWidth = 4)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(out === Set((1L, 10L)))
  }

  test("keys scope the match") {
    val p = Seq(("a", 1L, 5L), ("b", 2L, 5L)).toDF("k", "pid", "pos")
    val i = Seq(("a", 10L, 0L, 9L)).toDF("k", "iid", "s", "e")
    val out = RangeJoin.pointInInterval(p, i, "pos", "s", "e",
        bucketWidth = 4, keys = Seq("k"))
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(out === Set((1L, 10L)), "same range, wrong key must not match")
  }

  test("intervalOverlap matches the naive join exactly, multiset-safe") {
    val l = Seq((1L, 0L, 10L), (2L, 12L, 20L), (3L, 5L, 50L),
      (3L, 5L, 50L) /* duplicate row must appear twice in output */)
      .toDF("lid", "ls", "le")
    val r = Seq((10L, 10L, 11L), (11L, 21L, 30L), (12L, 60L, 70L),
      (13L, 49L, 49L)).toDF("rid", "rs", "re")
    val naive = l.join(r, col("ls") <= col("re") && col("rs") <= col("le"))
      .select("lid", "rid").as[(Long, Long)].collect()
      .groupBy(identity).view.mapValues(_.length).toMap
    assert(naive((3L, 13L)) === 2, "fixture: the duplicate left row double-counts")
    assert(naive.contains((1L, 10L)), "fixture: touching endpoints (10,10) overlap")
    for (w <- Seq(1L, 4L, 16L, 128L)) {
      val bucketed = RangeJoin.intervalOverlap(l, r, "ls", "le", "rs", "re",
          bucketWidth = w).select("lid", "rid").as[(Long, Long)].collect()
        .groupBy(identity).view.mapValues(_.length).toMap
      assert(bucketed === naive,
        s"bucketWidth=$w must reproduce the naive multiset")
    }
  }

  test("randomized: both shapes equal the naive joins on 300x200 random data") {
    val rnd = new scala.util.Random(11)
    val p = (1 to 300).map(i => (i.toLong, rnd.nextInt(1000).toLong))
      .toDF("pid", "pos")
    val iv = (1 to 200).map { i =>
      val s = rnd.nextInt(1000).toLong
      (i.toLong + 1000L, s, s + rnd.nextInt(40).toLong)
    }.toDF("iid", "s", "e")
    val naivePt = p.join(iv, col("pos") >= col("s") && col("pos") <= col("e"))
      .select("pid", "iid").as[(Long, Long)].collect().sorted.toSeq
    val bucketedPt = RangeJoin.pointInInterval(p, iv, "pos", "s", "e",
        bucketWidth = 32).select("pid", "iid")
      .as[(Long, Long)].collect().sorted.toSeq
    assert(bucketedPt === naivePt)

    val l2 = iv.select(col("iid").as("lid"), col("s").as("ls"), col("e").as("le"))
    val naiveOv = l2.join(iv, col("ls") <= col("e") && col("s") <= col("le"))
      .select("lid", "iid").as[(Long, Long)].collect().sorted.toSeq
    val bucketedOv = RangeJoin.intervalOverlap(l2, iv, "ls", "le", "s", "e",
        bucketWidth = 32).select("lid", "iid")
      .as[(Long, Long)].collect().sorted.toSeq
    assert(bucketedOv === naiveOv)
  }

  test("non-key column collision fails fast") {
    intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(pts.withColumnRenamed("pid", "iid"), ivals,
        "pos", "s", "e", bucketWidth = 4)
    }
  }

  test("tiered point join equals naive on a heavy-tailed width distribution") {
    // 195 minute-scale intervals + 5 "year-long" outliers (width ~100k):
    // the width-skew shape the tiers exist for. Duplicate tail row keeps
    // the multiset claim honest; a null-bound and an empty interval keep
    // the no-rows rule covered across the tier filters.
    val rnd = new scala.util.Random(23)
    val p = (1 to 400).map(i => (i.toLong, rnd.nextInt(200000).toLong))
      .toDF("pid", "pos")
    val narrow = (1 to 195).map { i =>
      val s = rnd.nextInt(200000).toLong
      (i.toLong, s, s + rnd.nextInt(30).toLong)
    }
    val tail = (196 to 200).map { i =>
      val s = rnd.nextInt(50000).toLong
      (i.toLong, s, s + 100000L + rnd.nextInt(30000).toLong)
    }
    val iv = (narrow ++ tail ++ Seq(tail.head) /* duplicate tail row */)
      .toDF("iid", "s", "e")
      .unionByName(Seq((900L, Option.empty[Long], Some(5L)),
        (901L, Some(50L), Some(10L))).toDF("iid", "s", "e"))
    val naive = p.join(iv, col("pos") >= col("s") && col("pos") <= col("e"))
      .select("pid", "iid").as[(Long, Long)].collect()
      .groupBy(identity).view.mapValues(_.length).toMap
    assert(naive.exists { case ((_, iid), n) => iid === tail.head._1 && n === 2 },
      "fixture: the duplicated tail interval double-counts")
    val tiered = RangeJoin.pointInIntervalTiered(p, iv, "pos", "s", "e",
        bucketWidth = 16, tailWidth = 1000, tailBucketWidth = 65536)
      .select("pid", "iid").as[(Long, Long)].collect()
      .groupBy(identity).view.mapValues(_.length).toMap
    assert(tiered === naive)
  }

  test("tiered overlap equals naive on heavy-tailed widths, multiset-safe") {
    val rnd = new scala.util.Random(29)
    def mk(n: Int, idBase: Long) = (1 to n).map { i =>
      val s = rnd.nextInt(100000).toLong
      val wide = i % 25 == 0 // 4% year-long tail
      (idBase + i, s, s + (if (wide) 80000L + rnd.nextInt(20000)
                           else rnd.nextInt(40).toLong))
    }
    val lRows = mk(120, 0L)
    val l = (lRows ++ Seq(lRows.head) /* duplicate row: multiset check */)
      .toDF("lid", "ls", "le")
    val r = mk(100, 1000L).toDF("rid", "rs", "re")
    val naive = l.join(r, col("ls") <= col("re") && col("rs") <= col("le"))
      .select("lid", "rid").as[(Long, Long)].collect()
      .groupBy(identity).view.mapValues(_.length).toMap
    val tiered = RangeJoin.intervalOverlapTiered(l, r, "ls", "le", "rs", "re",
        bucketWidth = 16, tailWidth = 1000, tailBucketWidth = 32768)
      .select("lid", "rid").as[(Long, Long)].collect()
      .groupBy(identity).view.mapValues(_.length).toMap
    assert(tiered === naive)
  }

  test("tiered guards: tailBucketWidth must be coarser; tailWidth positive") {
    intercept[IllegalArgumentException] {
      RangeJoin.pointInIntervalTiered(pts, ivals, "pos", "s", "e",
        bucketWidth = 8, tailWidth = 100, tailBucketWidth = 8)
    }
    intercept[IllegalArgumentException] {
      RangeJoin.intervalOverlapTiered(pts.toDF("lid", "ls").withColumn("le", col("ls")),
        ivals, "ls", "le", "s", "e",
        bucketWidth = 8, tailWidth = 0, tailBucketWidth = 64)
    }
  }
}
