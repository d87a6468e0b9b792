package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TopKAggregator
import graft.operators.Sessionize

class TopKAggregatorSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("typed top-k agrees with the window row_number formulation") {
    val events = Tables.events(spark, "/root/testdata/sf0.001")
      .filter(col("value").isNotNull)
    val fromWindow = Sessionize.topKPerKey(events, Seq("user_id"),
        col("value"), col("event_id"), k = 3)
      .select("user_id", "event_id", "value")
      .as[(Long, Long, Double)].collect()
      .groupBy(_._1).view.mapValues(_.map(r => (r._3, r._2)).toSet).toMap

    val agg = new TopKAggregator(3).toColumn
    val fromAggregator = events.select(col("user_id"),
        struct(col("value"), col("event_id")).as("p"))
      .as[(Long, (Double, Long))]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(agg.name("topk"))
      .collect()
      .map { case (u, tk) => u -> tk.toSet }.toMap

    assert(fromAggregator.keySet === fromWindow.keySet)
    fromWindow.foreach { case (u, expected) =>
      assert(fromAggregator(u) === expected, s"user $u")
    }
  }

  test("buffer stays capped at k through merges and orders deterministically") {
    val data = (1L to 100L).map(i => (1L, ((i % 10).toDouble, i)))
    val out = data.toDF("g", "p").as[(Long, (Double, Long))]
      .repartition(8) // force partial buffers + merge
      .groupByKey(_._1).mapValues(_._2)
      .agg(new TopKAggregator(5).toColumn.name("tk"))
      .collect().head._2
    assert(out.length === 5)
    // top score 9.0 at ids 9,19,29,39,49 -> tie-break ascending id
    assert(out === Seq((9.0, 9L), (9.0, 19L), (9.0, 29L), (9.0, 39L), (9.0, 49L)))
  }
}
