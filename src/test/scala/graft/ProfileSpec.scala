package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Profile

/** Column profiler: hand-checked stats including an all-null column,
  * approx-distinct mode bounds, and the single-scan plan property.
  */
class ProfileSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def corpus = Seq(
    (1L, Some("en"), Some(10L)),
    (2L, Some("en"), None),
    (3L, Some("de"), Some(30L)),
    (4L, None, Some(10L))
  ).toDF("id", "lang", "n")

  test("per-column stats match hand counts; all-null column stays total") {
    val p = Profile.profile(corpus.withColumn("dead", lit(null).cast("string")),
        Seq("id", "lang", "n", "dead"))
      .collect().map(r => r.getString(0) -> r).toMap
    val id = p("id")
    assert(id.getLong(1) === 4L && id.getLong(2) === 0L && id.getLong(3) === 4L)
    assert(id.getString(4) === "1" && id.getString(5) === "4")
    val lang = p("lang")
    assert(lang.getLong(1) === 3L && lang.getLong(2) === 1L && lang.getLong(3) === 2L)
    assert(lang.getString(4) === "de" && lang.getString(5) === "en")
    val n = p("n")
    assert(n.getLong(1) === 3L && n.getLong(2) === 1L && n.getLong(3) === 2L)
    assert(n.getString(4) === "10" && n.getString(5) === "30")
    val dead = p("dead")
    assert(dead.getLong(1) === 0L && dead.getLong(2) === 4L && dead.getLong(3) === 0L)
    assert(dead.isNullAt(4) && dead.isNullAt(5))
  }

  test("approx mode drops the Expand and stays within HLL error") {
    val wide = spark.range(0, 5000).select(col("id"),
      (col("id") % 97).as("mod"))
    val exactPlan = Profile.profile(wide, Seq("id", "mod"))
      .queryExecution.executedPlan.toString
    assert(exactPlan.contains("Expand"),
      "exact multi-distinct plans through Expand")
    val approx = Profile.profile(wide, Seq("id", "mod"), exactDistinct = false)
    assert(!approx.queryExecution.executedPlan.toString.contains("Expand"))
    // default rsd is 5% at one sigma — bound at ~3 sigma
    val d = approx.collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(math.abs(d("id") - 5000L) <= 750, s"HLL estimate off: ${d("id")}")
    assert(math.abs(d("mod") - 97L) <= 15)
  }

  test("topValues: per-column modes, tie-break by value, nulls excluded") {
    val t = Profile.topValues(corpus, Seq("lang", "n"), k = 1)
      .collect().map(r => r.getString(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(t("lang") === (("en", 2L))) // null lang row excluded
    assert(t("n") === (("10", 2L)))
    val t2 = Profile.topValues(corpus, Seq("lang"), k = 3)
      .collect().map(r => (r.getString(1), r.getLong(2), r.getInt(3)))
    // en(2) then de(1); no null row
    assert(t2.toSeq === Seq(("en", 2L, 1), ("de", 1L, 2)))
  }

  test("drift: schema add/drop status, count deltas, bounds flag") {
    val before = Profile.profile(corpus, Seq("id", "lang", "n"))
    val after = Profile.profile(
      corpus.filter(col("lang") === "en").withColumn("extra", lit(1L)),
      Seq("id", "lang", "extra"))
    val d = Profile.drift(before, after)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(d("n").getString(1) === "dropped")
    assert(d("extra").getString(1) === "added")
    assert(d("id").getString(1) === "common")
    // en-only: ids {1, 2} of 4 -> counts shrink, bounds move (max 4 -> 2)
    assert(d("id").getLong(2) === 4L && d("id").getLong(3) === 2L)
    assert(!d("id").getBoolean(8))
    // lang collapses to one distinct value, bounds now en..en
    assert(d("lang").getLong(6) === 2L && d("lang").getLong(7) === 1L)
    assert(!d("lang").getBoolean(8))
  }

  test("one scan: the profile never unions per-column subqueries") {
    val plan = Profile.profile(corpus, Seq("id", "lang", "n"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Union"), s"per-column re-scan:\n$plan")
  }

  test("outliersMad: discrete median/MAD, odd and even groups") {
    val df = Seq(
      ("a", 1L, 1.0), ("a", 2L, 2.0), ("a", 3L, 3.0), ("a", 4L, 4.0),
      ("a", 5L, 100.0), // odd group: med=3, mad=1 -> only 100 flagged
      ("b", 6L, 1.0), ("b", 7L, 2.0), ("b", 8L, 3.0),
      ("b", 9L, 10.0) // even group: lower med=2, mad=1 -> only 10 flagged
    ).toDF("grp0", "id0", "v0")
    val got = Profile.outliersMad(df, "grp0", "v0", "id0", k = 3)
      .select("grp", "id", "v", "med", "mad", "dev")
      .as[(String, Long, Double, Double, Double, Double)].collect().toSet
    assert(got === Set(
      ("a", 5L, 100.0, 3.0, 1.0, 97.0),
      ("b", 9L, 10.0, 2.0, 1.0, 8.0)))
  }

  test("outliersMad: zero MAD flags every deviation (documented edge)") {
    val df = Seq(("c", 1L, 5.0), ("c", 2L, 5.0), ("c", 3L, 5.0),
      ("c", 4L, 9.0)).toDF("g", "i", "x")
    val got = Profile.outliersMad(df, "g", "x", "i")
      .select("id").as[Long].collect().toSeq
    // med=5, every dev but one is 0 -> mad=0 -> any nonzero dev flags
    assert(got === Seq(4L))
  }

  test("equiDepthBins: near-equal counts, exact data-value bounds") {
    val df = (1L to 10L).map(i => ("g", i, i * 10.0)).toDF("g", "i", "v")
    val got = Profile.equiDepthBins(df, "g", "v", "i", nBins = 3)
      .select("bin", "n", "bin_min", "bin_max")
      .as[(Int, Long, Double, Double)].collect().sortBy(_._1).toSeq
    // 10 rows over 3 bins: first 10 % 3 = 1 bin takes the extra row
    assert(got === Seq((1, 4L, 10.0, 40.0), (2, 3L, 50.0, 70.0),
      (3, 3L, 80.0, 100.0)))
    intercept[IllegalArgumentException] {
      Profile.equiDepthBins(df, "g", "v", "i", nBins = 0)
    }
  }

  test("correlations: sign and magnitude on constructed linear data") {
    val df = spark.range(0, 1000).select(
      (col("id") % 2).cast("string").as("g"),
      col("id").cast("double").as("x"),
      (col("id") * 2 + 1).cast("double").as("y"),
      (-col("id")).cast("double").as("z"),
      pmod(col("id") * 2654435761L, lit(97L)).cast("double").as("w"))
    val rows = Profile.correlations(df, "g",
        Seq(("x", "y"), ("x", "z"), ("x", "w")))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) -> r.getDouble(3))
      .toMap
    for (g <- Seq("0", "1")) {
      assert(rows((g, "x", "y")) >= 0.9999, "perfect positive correlation")
      assert(rows((g, "x", "z")) <= -0.9999, "perfect negative correlation")
      assert(math.abs(rows((g, "x", "w"))) < 0.2, "hash column decorrelated")
    }
    assert(rows.size === 6)
  }

  test("psi: zero on identical snapshots, hand value on a known shift") {
    val before = Seq.fill(80)("a").map(Tuple1(_)) ++ Seq.fill(20)("b").map(Tuple1(_))
    val after = Seq.fill(50)("a").map(Tuple1(_)) ++ Seq.fill(50)("b").map(Tuple1(_))
    val bdf = before.toDF("c")
    val adf = after.toDF("c")
    val same = Profile.psi(bdf, bdf, col("c"), "c").head()
    assert(same.getAs[Long]("n_bins") == 2L)
    assert(math.abs(same.getAs[Double]("psi")) < 1e-12)
    // PSI = (0.5-0.8)ln(0.5/0.8) + (0.5-0.2)ln(0.5/0.2)
    val expected = (0.5 - 0.8) * math.log(0.5 / 0.8) +
      (0.5 - 0.2) * math.log(0.5 / 0.2)
    val shifted = Profile.psi(bdf, adf, col("c"), "c").head().getAs[Double]("psi")
    assert(math.abs(shifted - expected) < 1e-9)
  }

  test("psi: a vanished bin contributes a finite eps-floored term") {
    val bdf = (Seq.fill(90)("a") ++ Seq.fill(10)("gone")).map(Tuple1(_)).toDF("c")
    val adf = Seq.fill(100)("a").map(Tuple1(_)).toDF("c")
    val r = Profile.psi(bdf, adf, col("c"), "c").head()
    assert(r.getAs[Long]("n_bins") == 2L)
    val psi = r.getAs[Double]("psi")
    // 'gone': (1e-6 - 0.1) ln(1e-6/0.1) ~ +1.15; 'a': (1.0-0.9)ln(1/0.9)
    val expected = (1e-6 - 0.1) * math.log(1e-6 / 0.1) +
      (1.0 - 0.9) * math.log(1.0 / 0.9)
    assert(math.abs(psi - expected) < 1e-9)
    assert(psi > 1.0 && !psi.isInfinite)
  }

  test("hdrBins/hdrQuantiles: batch folds are EXACT and estimates bound the truth") {
    val rnd = new scala.util.Random(13)
    val vals = (0 until 3000).map(_ => (rnd.nextInt(3) match {
      case 0 => rnd.nextInt(50).toDouble
      case 1 => 1000.0 + rnd.nextInt(100000)
      case _ => math.abs(rnd.nextGaussian()) * 1e6
    }))
    val df = vals.zipWithIndex.map { case (v, i) => (s"g${i % 2}", v) }
      .toDF("grp", "v")
    // fold of 3 batch summaries == the one-shot summary EXACTLY
    val oneShot = Profile.hdrBins(df, "grp", "v")
    val folded = (0 until 3).map(i =>
        Profile.hdrBins(df.filter(expr(s"abs(hash(v)) % 3 = $i")), "grp", "v"))
      .reduce(Profile.hdrMerge)
    def bm(b: org.apache.spark.sql.DataFrame) =
      b.as[(String, Int, Long)].collect().toSet
    assert(bm(folded) == bm(oneShot))
    // every estimate lower-bounds the true rank value within bucket width
    val qs = Seq(("p50", 1L, 2L), ("p90", 9L, 10L), ("p99", 99L, 100L))
    val est = Profile.hdrQuantiles(oneShot, qs)
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val byGrp = vals.zipWithIndex.groupBy { case (_, i) => s"g${i % 2}" }
      .view.mapValues(_.map(v => math.floor(v._1).toLong).sorted).toMap
    for ((g, sorted) <- byGrp; (label, num, den) <- qs) {
      val n = sorted.length.toLong
      val r = ((n * num + den - 1) / den).toInt // ceil(q*N), 1-based
      val truth = sorted(r - 1)
      val e = est((g, label))
      assert(e <= truth, s"$g/$label: est $e above truth $truth")
      assert(truth <= e + (e + 1) / 16 + 2,
        s"$g/$label: truth $truth beyond bucket width of est $e")
    }
  }

  test("hdrBins: high octaves (e >= 60) bin exactly, no Long overflow") {
    // values with octave 59..61 — the ((w-p)*16) form would wrap
    // negative here; the div-by-(p/16) form must agree with a driver
    // replay and stay non-negative all the way to the 2^62 cutoff
    val vals = Seq((1L << 59).toDouble + (1L << 58).toDouble,
      (1L << 60).toDouble, (1L << 60).toDouble + (1L << 59).toDouble,
      (1L << 61).toDouble, (1L << 61).toDouble + (1L << 60).toDouble,
      (1L << 62).toDouble - (1L << 52).toDouble, 3.0, 17.0)
    val df = vals.map(("g", _)).toDF("grp", "v")
    def replay(v: Double): Int = {
      val w = math.floor(v).toLong + 1L
      val e = 63 - java.lang.Long.numberOfLeadingZeros(w)
      val p = 1L << e
      val sub = if (e < 4) (((w - p) * 16) / p).toInt
                else ((w - p) / (p / 16)).toInt
      e * 16 + sub
    }
    val got = Profile.hdrBins(df, "grp", "v")
      .as[(String, Int, Long)].collect().map(r => r._2 -> r._3).toMap
    val want = vals.groupBy(replay).view.mapValues(_.size.toLong).toMap
    assert(got == want)
    assert(got.keys.forall(_ >= 0), "no wrapped-negative bin ids")
  }

  test("hdrQuantiles: guards and degenerate inputs") {
    val one = Seq(("g", 0.0)).toDF("grp", "v")
    val est = Profile.hdrQuantiles(Profile.hdrBins(one, "grp", "v"),
      Seq(("p50", 1L, 2L))).as[(String, String, Long)].collect()
    assert(est.toSeq == Seq(("g", "p50", 0L))) // single zero value -> 0
    intercept[IllegalArgumentException] {
      Profile.hdrQuantiles(Profile.hdrBins(one, "grp", "v"),
        Seq(("bad", 3L, 2L)))
    }
  }
}
