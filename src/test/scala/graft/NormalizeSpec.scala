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
}
