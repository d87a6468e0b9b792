package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextAnalysis
import graft.operators.SequencePack

class SequencePackSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def tokens = TextAnalysis
    .withTokenCounts(Tables.documents(spark, sf))
    .select(col("doc_id"), col("ws_tokens"))

  test("two-phase distributed prefix sum equals the single-task window") {
    // forcing few buckets exercises multiple bucket boundaries even at
    // tiny sf; the naive formulation is the spec, not the implementation
    val naive = tokens
      .withColumn("offset", coalesce(sum(col("ws_tokens")).over(
        Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)),
        lit(0)).cast("long"))
      .withColumn("bin", floor(col("offset") / 2048).cast("long"))
      .select("doc_id", "offset", "bin")
    val fast = SequencePack.packOffsets(tokens, buckets = 7)
      .select("doc_id", "offset", "bin")
    assert(fast.exceptAll(naive).isEmpty && naive.exceptAll(fast).isEmpty)
  }

  test("offsets are a strictly consistent running total") {
    val rows = SequencePack.packOffsets(tokens, buckets = 5)
      .orderBy("doc_id")
      .select(col("ws_tokens").cast("long"), col("offset"))
      .collect()
    var acc = 0L
    rows.foreach { r =>
      assert(r.getLong(1) === acc, "offset must equal sum of prior tokens")
      acc += r.getLong(0)
    }
  }

  test("empty input keeps the schema contract") {
    val empty = SequencePack.packOffsets(tokens.filter(lit(false)))
    assert(empty.columns.toSeq === Seq("doc_id", "ws_tokens", "offset", "bin"))
    assert(empty.count() === 0)
  }

  test("first-fit packing matches the hand-run greedy fold") {
    import spark.implicits._
    // capacity 10, one group, sizes 6,5,4,3,7,2 in id order:
    //   6 -> bin0[6]; 5 -> bin1[5]; 4 -> bin0[10]; 3 -> bin1[8];
    //   7 -> bin2[7]; 2 -> bin1[10]
    val docs = Seq((0L, 6L), (1L, 5L), (2L, 4L), (3L, 3L), (4L, 7L), (5L, 2L))
      .toDF("doc_id", "ws_tokens")
    val out = SequencePack.binPackFirstFit(docs, binCapacity = 10)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(out === Map(
      0L -> ((0L, 0L)), 1L -> ((1L, 0L)), 2L -> ((0L, 6L)),
      3L -> ((1L, 5L)), 4L -> ((2L, 0L)), 5L -> ((1L, 8L))))
  }

  test("first-fit packing: no bin overflows, groups namespace bins, oversized docs isolate") {
    import spark.implicits._
    // ids straddle a 512 boundary -> two independent groups; doc 600 is
    // oversized (cap 50) and must sit alone in its own bin
    val docs = ((0L until 20L).map(i => (i, 17L)) ++
      Seq((600L, 80L)) ++ (601L until 610L).map(i => (i, 30L))).toDF("doc_id", "ws_tokens")
    val out = SequencePack.binPackFirstFit(docs, binCapacity = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // bins from different groups never collide
    val g0bins = out.filter(_._1 < 512).map(_._3).toSet
    val g1bins = out.filter(_._1 >= 512).map(_._3).toSet
    assert(g0bins.forall(_ < 512) && g1bins.forall(_ >= 512))
    // no bin exceeds capacity except a singleton oversized doc
    out.groupBy(_._3).foreach { case (bin, rows) =>
      val total = rows.map(_._2).sum
      assert(total <= 50 || rows.length == 1,
        s"bin $bin overflows with ${rows.length} docs totalling $total")
    }
    // the oversized doc is alone in its bin
    val oversizedBin = out.find(_._1 == 600L).get._3
    assert(out.count(_._3 == oversizedBin) === 1)
    // offsets within a bin are the running load in id order
    out.groupBy(_._3).foreach { case (_, rows) =>
      var acc = 0L
      rows.sortBy(_._1).foreach { r =>
        assert(r._4 === acc, s"bin_offset of doc ${r._1}")
        acc += r._2
      }
    }
  }
}
