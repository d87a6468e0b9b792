package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Retention

/** Retention cohorts: hand-checked cohort/offset matrix, Monday week
  * anchoring, and the offset-0-equals-cohort-size invariant.
  */
class RetentionSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def ts(day: String) = java.sql.Timestamp.valueOf(s"$day 10:00:00")

  test("cohort decay matrix matches hand counts") {
    // weeks: W0 = 2024-01-01 (Mon), W1 = 01-08, W2 = 01-15
    val events = Seq(
      ("a", ts("2024-01-02")), ("a", ts("2024-01-09")), // W0 cohort, active W0+W1
      ("b", ts("2024-01-03")), ("b", ts("2024-01-16")), // W0 cohort, active W0+W2
      ("b", ts("2024-01-04")), // same week again — distinct'd away
      ("c", ts("2024-01-10")) // W1 cohort, only W1
    ).toDF("user", "ts")
    val got = Retention.cohorts(events, col("user"), col("ts"))
      .as[(java.sql.Date, Long, Long)].collect()
      .map(r => (r._1.toString, r._2, r._3)).toSet
    assert(got === Set(
      ("2024-01-01", 0L, 2L), // a+b in their first week
      ("2024-01-01", 1L, 1L), // a
      ("2024-01-01", 2L, 1L), // b
      ("2024-01-08", 0L, 1L))) // c
  }

  test("weeks anchor on Monday: Sunday belongs to the prior week") {
    val events = Seq(
      ("x", ts("2024-01-07")), // Sunday -> week of 2024-01-01
      ("x", ts("2024-01-08")) // Monday -> next week, offset 1
    ).toDF("user", "ts")
    val got = Retention.cohorts(events, col("user"), col("ts"))
      .as[(java.sql.Date, Long, Long)].collect()
      .map(r => (r._1.toString, r._2, r._3)).toSet
    assert(got === Set(("2024-01-01", 0L, 1L), ("2024-01-01", 1L, 1L)))
  }

  test("offset 0 counts every entity of the cohort") {
    val events = Tables.events(spark, "/root/testdata/sf0.001")
      .filter(col("event_type") === "purchase")
    val m = Retention.cohorts(events, col("user_id"), col("ts"))
      .filter(col("week_offset") === 0)
      .agg(sum(col("n_active"))).as[Long].collect().head
    val users = events.select(col("user_id")).distinct().count()
    assert(m === users, "every entity is active in its own first week")
  }
}
