package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Sketch-aggregate checks that cannot be DuckDB-oracled (different
  * sketch implementations): bound the approximation error against exact
  * counts instead.
  */
class AggregatesSpec extends AnyFunSuite with SparkTestBase {

  test("approx_count_distinct stays within rsd bounds of the exact count") {
    val events = Tables.events(spark, "/root/testdata/sf0.01")
    val exact = events.groupBy(to_date(col("ts")).as("d"))
      .agg(countDistinct(col("user_id")).as("exact"))
    val approx = SparkEntry.queries("approx_distinct_users_daily")(
      spark, "/root/testdata/sf0.01")
      .withColumnRenamed("event_date", "d")
    val joined = exact.join(approx, "d").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val e = r.getAs[Long]("exact").toDouble
      val a = r.getAs[Long]("approx_users").toDouble
      // rsd=0.02 -> allow 5 sigma
      assert(math.abs(a - e) / e <= 0.10, s"day ${r.get(0)}: approx $a vs exact $e")
    }
  }
}
