package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{KpiAggregator, TripMatcher}

/** ScalaCheck invariants (SURVEY.md par.5 item 4). Plain Gen + fixed seeds
  * (scalatestplus bridge isn't on the offline classpath); samples stay
  * small — each one is a Spark job.
  */
class KpiPropertiesSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  private val tripGen: Gen[List[(String, Double)]] = Gen.nonEmptyListOf(for {
    day <- Gen.choose(1, 3)
    fare <- Gen.choose(1.0, 500.0)
  } yield (f"2024-05-$day%02d", fare))

  test("KPI invariants: min <= avg <= max, counts match cardinality") {
    for (trips <- samples(tripGen, 5)) {
      val df = trips.zipWithIndex
        .map { case ((d, f), i) => (i.toString, d, f) }
        .toDF("trip_id", "pickup_date_str", "fare_amount")
      val kpis = KpiAggregator.dailyKpis(df,
        to_date(col("pickup_date_str")), col("fare_amount"), col("trip_id"))
        .collect()
      assert(kpis.map(_.getAs[Long]("trip_count")).sum === trips.size)
      kpis.foreach { r =>
        val (mn, av, mx) = (r.getAs[Double]("minimum_fare"),
          r.getAs[Double]("average_fare"), r.getAs[Double]("maximum_fare"))
        assert(mn <= av + 1e-9 && av <= mx + 1e-9)
        assert(math.abs(r.getAs[Double]("total_fare") -
          av * r.getAs[Long]("trip_count")) <
          1e-6 * math.max(1.0, r.getAs[Double]("total_fare")))
      }
    }
  }

  test("join cardinality: |matched| <= min(|starts|,|ends|) under unique keys") {
    for ((nS, nE) <- samples(Gen.zip(Gen.choose(0, 30), Gen.choose(0, 30)), 5)) {
      val starts = (0 until nS).map(i => (s"t$i", i)).toDF("trip_id", "x")
      val ends = (5 until 5 + nE).map(i => (s"t$i", i)).toDF("trip_id", "y")
      val matched = TripMatcher.matchTrips(starts, ends).count()
      assert(matched <= math.min(nS, nE))
      assert(TripMatcher.unmatchedStarts(starts, ends).count() === nS - matched)
    }
  }
}
