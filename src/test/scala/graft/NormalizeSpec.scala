package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Normalize

/** Winsorization: hand-checked clipping against exact interpolated
  * percentiles, per-group independence, null/NaN passthrough, and the
  * broadcast plan shape.
  */
class NormalizeSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("clips to interpolated per-group bounds; groups are independent") {
    // group a: 1..10 -> p10 = 1.9, p90 = 9.1 (linear interpolation)
    // group b: 100..1000 by 100 -> p10 = 190, p90 = 910
    val df = ((1 to 10).map(i => ("a", i.toDouble)) ++
      (1 to 10).map(i => ("b", i * 100.0))).toDF("g", "v")
    val out = Normalize.winsorize(df, "v", Seq("g"), lo = 0.1, hi = 0.9)
      .select("g", "v", "v_w").as[(String, Double, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(out(("a", 1.0)) === 1.9)
    assert(out(("a", 10.0)) === 9.1)
    assert(out(("a", 5.0)) === 5.0) // interior untouched
    assert(out(("b", 100.0)) === 190.0)
    assert(out(("b", 1000.0)) === 910.0)
    assert(out(("b", 500.0)) === 500.0)
  }

  test("null and NaN pass through; bounds ignore them") {
    val df = Seq(("a", Some(1.0)), ("a", Some(2.0)), ("a", Some(3.0)),
      ("a", None), ("a", Some(Double.NaN))).toDF("g", "v")
    val out = Normalize.winsorize(df, "v", Seq("g"), 0.25, 0.75).collect()
    val byV = out.map(r => Option(r.get(1)) -> r)
    byV.foreach { case (v, r) =>
      v match {
        case None => assert(r.isNullAt(r.fieldIndex("v_w")))
        case Some(x) if x.asInstanceOf[Double].isNaN =>
          assert(r.getDouble(r.fieldIndex("v_w")).isNaN)
        case Some(x) =>
          val w = r.getDouble(r.fieldIndex("v_w"))
          assert(w >= 1.5 && w <= 2.5) // p25/p75 of {1,2,3}
      }
    }
  }

  test("the bounds join broadcasts; the fact side never shuffles") {
    val df = Tables.events(spark, "/root/testdata/sf0.001")
    val plan = Normalize.winsorize(df, "value", Seq("event_type"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"bounds must broadcast:\n${plan.take(1500)}")
  }

  test("percentileRanks equals the single-window percent_rank") {
    import org.apache.spark.sql.expressions.Window
    val docs = graft.functions.TextAnalysis
      .withQualityScore(Tables.documents(spark, "/root/testdata/sf0.001"))
      .select(col("doc_id"), col("lang"),
        floor(col("quality_score") * 10000).cast("long").as("q_ppm"))
    val got = Normalize.percentileRanks(docs, "lang", "q_ppm", "doc_id")
      .select("doc_id", "rank", "pct").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val w = Window.partitionBy("lang").orderBy("q_ppm", "doc_id")
    val want = docs
      .withColumn("rank", row_number().over(w).cast("long"))
      .withColumn("pct", percent_rank().over(w))
      .select("doc_id", "rank", "pct").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("percentileRanks: single-row group gets pct 0, not NaN") {
    import spark.implicits._
    val df = Seq(("a", 5L, 1L), ("b", 3L, 2L), ("b", 7L, 3L))
      .toDF("g", "tier", "id")
    val out = Normalize.percentileRanks(df, "g", "tier", "id")
      .select("g", "id", "rank", "pct").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(out == Set(("a", 1L, 1L, 0.0), ("b", 2L, 1L, 0.0), ("b", 3L, 2L, 1.0)))
  }
}
