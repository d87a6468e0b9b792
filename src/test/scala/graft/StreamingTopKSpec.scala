package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{StreamingTopK, TopKObs}

/** Space-Saving heavy hitters: exact counts while slots are free, the
  * classic guarantees on a skewed overflowing stream (bounded state,
  * error certificate, no lost heavy hitter), and cross-batch state.
  */
class StreamingTopKSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private var n = 0
  private def run(m: Int, batches: Seq[Seq[TopKObs]]): Map[(String, String), (Long, Long)] = {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[TopKObs]
    n += 1
    val name = s"topk_out_$n"
    val q = StreamingTopK.heavyHitters(input.toDS(), m)
      .writeStream.format("memory").queryName(name).outputMode("update").start()
    try batches.foreach { b => input.addData(b); q.processAllAvailable() }
    finally q.stop()
    // Update mode re-emits per batch — keep each counter's LAST row
    spark.table(name).as[(String, String, Long, Long)].collect()
      .zipWithIndex
      .groupBy(r => (r._1._1, r._1._2))
      .map { case (k, rows) =>
        val last = rows.maxBy(_._2)._1; k -> ((last._3, last._4))
      }
  }

  test("exact counts while under capacity; state carries across batches") {
    val got = run(4, Seq(
      Seq(TopKObs("col", "a"), TopKObs("col", "a"), TopKObs("col", "b")),
      Seq(TopKObs("col", "a"), TopKObs("col", "c"))))
    assert(got === Map(
      ("col", "a") -> ((3L, 0L)), ("col", "b") -> ((1L, 0L)),
      ("col", "c") -> ((1L, 0L))))
  }

  test("skewed overflow: bounded state, err certificate, heavy hitters kept") {
    // 100 of "hot", 50 of "warm", then 30 distinct one-off values; m=8
    val feed = (1 to 100).map(_ => TopKObs("k", "hot")) ++
      (1 to 50).map(_ => TopKObs("k", "warm")) ++
      (1 to 30).map(i => TopKObs("k", s"rare$i"))
    val got = run(8, Seq(feed))
    assert(got.size <= 8, s"state must stay bounded: ${got.size}")
    // true frequency > N/m (180/8 = 22.5) guarantees presence
    assert(got.contains(("k", "hot")) && got.contains(("k", "warm")))
    // count - err is a LOWER bound on the true count; count an upper
    val (hc, he) = got(("k", "hot")); val (wc, we) = got(("k", "warm"))
    assert(hc >= 100L && hc - he <= 100L)
    assert(wc >= 50L && wc - we <= 50L)
    // the fold is value-ordered (the determinism fix), so "hot" lands
    // before the rare churn and keeps an exact count; "warm" folds
    // AFTER the 30 rares have cycled the low slots, so its counter
    // carries an inherited err — the certificate bounds above are the
    // contract, exactness is only guaranteed for never-evicted entries
    assert(he === 0L && we >= 0L)
  }

  test("eviction inherits min+1 with err=min, deterministically") {
    val got = run(2, Seq(Seq(
      TopKObs("k", "a"), TopKObs("k", "a"), TopKObs("k", "b"),
      TopKObs("k", "z")))) // z evicts b (the min; tie broken by value)
    assert(got === Map(
      ("k", "a") -> ((2L, 0L)), ("k", "z") -> ((2L, 1L))))
  }
}
