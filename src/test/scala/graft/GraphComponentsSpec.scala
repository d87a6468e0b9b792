package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{ConnectedComponents, Dedup}

/** Generic connected components: both variants (min-label fixpoint,
  * large/small-star contraction) must label every node with its
  * component's minimum id, for long AND string ids, independent of
  * input partitioning — and the star variant must converge in fewer
  * rounds than the diameter on a path graph (its reason to exist).
  */
class GraphComponentsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def both(edges: DataFrame): Seq[Map[Any, Any]] = Seq(
    ConnectedComponents.components(edges, "src", "dst"),
    ConnectedComponents.componentsStar(edges, "src", "dst"))
    .map(_.collect().map(r => r.get(0) -> r.get(1)).toMap)

  test("two components, a self-loop, and a duplicate edge — both variants") {
    // {1,2,3,4} chained + {7,9} — plus noise: self-loop 7-7, dup 1-2
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (9L, 7L), (7L, 7L), (1L, 2L))
      .toDF("src", "dst")
    val want = Map[Any, Any](1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      7L -> 7L, 9L -> 7L)
    both(edges).foreach(got => assert(got === want))
  }

  test("string node ids: natural (bytewise) ordering picks the label") {
    val edges = Seq(("o5", "c10"), ("o7", "c10"), ("zz", "aa"))
      .toDF("src", "dst")
    val want = Map[Any, Any]("o5" -> "c10", "o7" -> "c10", "c10" -> "c10",
      "zz" -> "aa", "aa" -> "aa")
    both(edges).foreach(got => assert(got === want))
  }

  test("partitioning invariance: 1, 3, and 7 partitions agree exactly") {
    // deterministic pseudo-random graph: 60 nodes, arithmetic edges
    val edges = (0 until 90)
      .map(i => ((i * 7919 % 60).toLong, (i * 104729 % 60).toLong))
      .toDF("src", "dst")
    val results = Seq(1, 3, 7).flatMap(p => both(edges.repartition(p)))
    results.tail.foreach(r => assert(r === results.head))
  }

  test("hybrid gate: driver union-find equals the distributed fixpoints exactly") {
    // driverMaxEdges = 0 forces the distributed path; the default takes
    // the union-find path on these small graphs — labels must agree
    // row-for-row for long AND (non-ASCII) string ids
    val longEdges = (0 until 90)
      .map(i => ((i * 7919 % 60).toLong, (i * 104729 % 60).toLong))
      .toDF("src", "dst")
    val strEdges = Seq(("o5", "c10"), ("o7", "c10"), ("zz", "aa"),
      ("éx", "az"), ("az", "aé")).toDF("src", "dst")
    for (edges <- Seq(longEdges, strEdges)) {
      def m(df: DataFrame) = df.collect().map(r => r.get(0) -> r.get(1)).toMap
      assert(m(ConnectedComponents.components(edges, "src", "dst")) ===
        m(ConnectedComponents.components(edges, "src", "dst", driverMaxEdges = 0)))
      assert(m(ConnectedComponents.componentsStar(edges, "src", "dst")) ===
        m(ConnectedComponents.componentsStar(edges, "src", "dst", driverMaxEdges = 0)))
    }
  }

  test("path graph: star contraction needs far fewer rounds than diameter") {
    // a 48-node path — diameter 47
    val path = (0L until 47L).map(i => (i, i + 1)).toDF("src", "dst")
    val (mlLabels, mlRounds, mlConv) = Dedup.minLabelClusters(
      graft.operators.PageRank.undirect(path, "src", "dst"))
    val (stLabels, stRounds, stConv) = Dedup.starClusters(path)
    assert(mlConv && stConv)
    // min-label pays ~diameter rounds; star pays ~log2(48) ≈ 6
    assert(mlRounds >= 40, s"min-label rounds: $mlRounds")
    assert(stRounds <= 12, s"star rounds: $stRounds")
    val want = (0L to 47L).map(_ -> 0L).toMap
    assert(mlLabels.as[(Long, Long)].collect().toMap === want)
    assert(stLabels.as[(Long, Long)].collect().toMap === want)
  }
}
