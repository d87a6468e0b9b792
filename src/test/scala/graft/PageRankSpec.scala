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

  /** The same recurrence, single-threaded over adjacency maps. */
  private def naive(edges: Seq[(String, String)], iters: Int,
      scale: Long): Map[String, Long] = {
    val out = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val nodes = edges.map(_._1).distinct
    val n = nodes.size
    val base = scale * 15L / (100L * n)
    var r = nodes.map(v => v -> scale / n).toMap
    for (_ <- 1 to iters) {
      r = edges.groupBy(_._2).map { case (dst, es) =>
        dst -> (base + 85L * es.map { case (src, _) => r(src) / out(src) }.sum / 100L)
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

  test("guards: empty edges and non-positive iters are rejected") {
    val e = raw.toDF("x", "y")
    intercept[IllegalArgumentException] {
      PageRank.ranks(e, "x", "y", iters = 0)
    }
    intercept[IllegalArgumentException] {
      PageRank.ranks(e.filter(lit(false)), "x", "y", iters = 1)
    }
  }
}
