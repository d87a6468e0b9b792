package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.PageRank

/** Integer-exact PageRank: equality with a naive in-memory replay of
  * the identical recurrence, structural sanity (hubs dominate), and
  * partitioning-invariance — the property the integer formulation buys.
  */
class PageRankSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  /** The same recurrence, single-threaded over adjacency maps; `seed`
    * restricts the restart set (all-true = uniform PageRank).
    */
  private def naive(edges: Seq[(String, String)], iters: Int,
      scale: Long, seed: String => Boolean = _ => true): Map[String, Long] = {
    val out = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val nodes = edges.map(_._1).distinct
    val n = nodes.count(seed)
    val base = scale * 15L / (100L * n)
    var r = nodes.map(v => v -> (if (seed(v)) scale / n else 0L)).toMap
    for (_ <- 1 to iters) {
      r = edges.groupBy(_._2).map { case (dst, es) =>
        dst -> ((if (seed(dst)) base else 0L) +
          85L * es.map { case (src, _) => r(src) / out(src) }.sum / 100L)
      }
    }
    r
  }

  private val raw = Seq(("a", "b"), ("a", "c"), ("b", "c"), ("c", "d"),
    ("d", "e"), ("b", "e"))

  test("matches the naive recurrence on a symmetrized graph") {
    val sym = raw.flatMap { case (x, y) => Seq((x, y), (y, x)) }.distinct
    val got = PageRank.ranks(
        PageRank.undirect(raw.toDF("x", "y"), "x", "y"), "src", "dst",
        iters = 3)
      .as[(String, Long)].collect().toMap
    assert(got === naive(sym, 3, PageRank.DefaultScale))
  }

  test("star hub collects the mass") {
    val star = (1 to 10).map(i => ("hub", s"leaf$i"))
    val ranks = PageRank.ranks(
        PageRank.undirect(star.toDF("x", "y"), "x", "y"), "src", "dst",
        iters = 3)
      .as[(String, Long)].collect().toMap
    val hub = ranks("hub")
    (1 to 10).foreach(i => assert(hub > ranks(s"leaf$i") * 5,
      "hub must dominate every leaf"))
    assert(ranks.values.toSet.size <= 2, "leaves are symmetric")
  }

  test("invariant to input partitioning") {
    val e = PageRank.undirect(raw.toDF("x", "y"), "x", "y")
    val one = PageRank.ranks(e, "src", "dst", iters = 3)
      .as[(String, Long)].collect().toMap
    val many = PageRank.ranks(e.repartition(7), "src", "dst", iters = 3)
      .as[(String, Long)].collect().toMap
    assert(one === many)
  }

  test("personalized: matches the seeded naive recurrence; decays with distance") {
    // path graph a-b-c-d-e, seeded at a
    val path = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"))
    val sym = path.flatMap { case (x, y) => Seq((x, y), (y, x)) }.distinct
    val got = PageRank.personalizedRanks(sym.toDF("x", "y"), "x", "y",
        iters = 3, isSeed = _ === "a")
      .as[(String, Long)].collect().toMap
    assert(got === naive(sym, 3, PageRank.DefaultScale, _ == "a"))
    // mass radiates from the seed in pulses: after 3 supersteps it has
    // reached d (distance 3) but NOT e (distance 4), and every reached
    // node holds less than the seed's neighbor
    assert(got("d") > 0L && got("e") === 0L, s"propagation frontier: $got")
    assert(Seq("c", "d", "e").forall(v => got(v) < got("b")), s"$got")
  }

  test("personalized with an all-true seed IS uniform PageRank") {
    val e = PageRank.undirect(raw.toDF("x", "y"), "x", "y")
    val uniform = PageRank.ranks(e, "src", "dst", iters = 3)
      .as[(String, Long)].collect().toMap
    val allSeeded = PageRank.personalizedRanks(e, "src", "dst", iters = 3,
        isSeed = _ => lit(true))
      .as[(String, Long)].collect().toMap
    assert(uniform === allSeeded)
  }

  test("weighted: matches a naive weighted replay; heavy edges pull mass") {
    // triangle a-b-c; a-b carries weight 9, the rest weight 1
    val we = Seq(("a", "b", 9L), ("b", "a", 9L), ("a", "c", 1L),
      ("c", "a", 1L), ("b", "c", 1L), ("c", "b", 1L))
    def naiveW(iters: Int, scale: Long): Map[String, Long] = {
      val wtot = we.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
      val n = wtot.size
      val base = scale * 15L / (100L * n)
      var r = wtot.keys.map(v => v -> scale / n).toMap
      for (_ <- 1 to iters) {
        r = we.groupBy(_._2).map { case (dst, es) =>
          dst -> (base + 85L * es.map { case (src, _, w) =>
            (r(src) / wtot(src)) * w
          }.sum / 100L)
        }
      }
      r
    }
    val got = PageRank.weightedRanks(we.toDF("src", "dst", "w"),
        "src", "dst", "w", iters = 3)
      .as[(String, Long)].collect().toMap
    assert(got === naiveW(3, PageRank.DefaultScale))
    // c receives only weight-1 trickle; a and b trade the heavy edge
    assert(got("a") > got("c") && got("b") > got("c"), s"$got")
  }

  test("weighted with all weights 1 IS the uniform operator") {
    val e = PageRank.undirect(raw.toDF("x", "y"), "x", "y")
    val uniform = PageRank.ranks(e, "src", "dst", iters = 3)
      .as[(String, Long)].collect().toMap
    val ones = PageRank.weightedRanks(
        e.withColumn("w", org.apache.spark.sql.functions.lit(1L)),
        "src", "dst", "w", iters = 3)
      .as[(String, Long)].collect().toMap
    assert(uniform === ones)
  }

  test("guards: empty edges and non-positive iters are rejected") {
    val e = raw.toDF("x", "y")
    intercept[IllegalArgumentException] {
      PageRank.ranks(e, "x", "y", iters = 0)
    }
    intercept[IllegalArgumentException] {
      PageRank.ranks(e.filter(lit(false)), "x", "y", iters = 1)
    }
  }

  test("broadcast superstep path == shuffle path bit for bit") {
    val prep = PageRank.prepare(
      PageRank.undirect(raw.toDF("x", "y"), "x", "y"), "src", "dst")
    for (iters <- Seq(1, 3, 7)) {
      val bcast = PageRank.ranksPreparedGated(prep, iters,
          PageRank.DefaultScale, broadcastGate = Long.MaxValue)
        .as[(String, Long)].collect().toMap
      val shuffle = PageRank.ranksPreparedGated(prep, iters,
          PageRank.DefaultScale, broadcastGate = 0L)
        .as[(String, Long)].collect().toMap
      assert(bcast === shuffle, s"paths diverged at iters=$iters")
    }
  }

  test("ranksToConvergence: exact fixpoint stop equals the full budget") {
    // a symmetric cycle: every node identical, the integer sequence
    // contracts geometrically and LANDS on its fixpoint exactly
    val cyc = (0 until 8).map(i => (s"n$i", s"n${(i + 1) % 8}"))
    val prep = PageRank.prepare(
      PageRank.undirect(cyc.toDF("x", "y"), "x", "y"), "src", "dst")
    val (ranks, rounds, converged) = PageRank.ranksToConvergence(prep, 300)
    assert(converged, "cycle must reach an integer fixpoint")
    assert(rounds < 300, s"fixpoint should arrive early, took $rounds")
    val got = ranks.as[(String, Long)].collect().toMap
    // stopping at the fixpoint == running any larger fixed budget
    val full = PageRank.ranksPrepared(prep, rounds + 10)
      .as[(String, Long)].collect().toMap
    assert(got === full)
    // and == the fixed-k run at exactly `rounds`
    val atRounds = PageRank.ranksPrepared(prep, rounds)
      .as[(String, Long)].collect().toMap
    assert(got === atRounds)
  }

  test("ranksToConvergence on the shuffle (large-graph) path: identical stop") {
    // gate 0 forces the path web-scale graphs take, where each round's
    // signature/exceptAll probes depend on the loop materializing its
    // round results — and the stop must be bit-identical to the
    // broadcast path's
    val cyc = (0 until 8).map(i => (s"n$i", s"n${(i + 1) % 8}"))
    val prep = PageRank.prepare(
      PageRank.undirect(cyc.toDF("x", "y"), "x", "y"), "src", "dst")
    val (rSmall, roundsSmall, convSmall) =
      PageRank.ranksToConvergence(prep, 50)
    val (rLarge, roundsLarge, convLarge) =
      PageRank.ranksToConvergenceGated(prep, 50, PageRank.DefaultScale,
        None, broadcastGate = 0L)
    assert(convSmall && convLarge)
    assert(roundsSmall == roundsLarge)
    assert(rLarge.as[(String, Long)].collect().toMap ===
      rSmall.as[(String, Long)].collect().toMap)
  }

  test("ranksToConvergence: budget exhaustion reports converged=false") {
    val sym = PageRank.prepare(
      PageRank.undirect(raw.toDF("x", "y"), "x", "y"), "src", "dst")
    val (ranks, rounds, converged) = PageRank.ranksToConvergence(sym, 2)
    assert(rounds == 2)
    val fixed = PageRank.ranksPrepared(sym, 2).as[(String, Long)].collect().toMap
    assert(ranks.as[(String, Long)].collect().toMap === fixed)
    // tiny asymmetric graph keeps moving after 2 rounds
    assert(!converged)
  }
}
