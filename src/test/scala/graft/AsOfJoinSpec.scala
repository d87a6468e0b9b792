package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AsOfJoin

/** Edge semantics of the union+window as-of formulation (VERDICT r5
  * item 1 / ADVICE r5): tie inclusivity, tolerance boundary, unmatched
  * and null-timestamp rows, null payload fields riding the carried
  * struct, and the fail-fast column-collision guards.
  */
class AsOfJoinSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def leftDf = Seq(
    ("a", Some(10L), "L1"),  // exact tie with a right row
    ("a", Some(20L), "L2"),  // between right rows → latest prior
    ("a", Some(5L),  "L0"),  // before every right row → unmatched
    ("b", Some(100L), "L3"), // far after its key's only right row
    ("a", None,      "LN")   // null left ts → kept, never matches
  ).toDF("k", "ts", "ltag")

  private def rightDf = Seq(
    ("a", Some(10L), Some("R10"), Some(1.0)),
    ("a", Some(15L), Some("R15"), Some(2.0)),
    ("b", Some(40L), Some("R40"), Some(3.0)),
    // null right ts: must be dropped, not carried into early left rows
    ("a", None,      Some("RN"),  Some(9.0))
  ).toDF("k", "rts", "rtag", "rval")

  private def matches(out: org.apache.spark.sql.DataFrame) =
    out.select("ltag", "asof_rts", "asof_rtag")
      .as[(String, Option[Long], Option[String])]
      .collect().map(t => t._1 -> ((t._2, t._3))).toMap

  test("backward inclusive match; unmatched and null-ts left rows keep nulls") {
    val out = AsOfJoin.asofBackward(leftDf, rightDf, Seq("k"), "ts", "rts",
      Seq("rtag", "rval"))
    assert(out.count() === 5L, "left-join semantics: every left row kept")
    val m = matches(out)
    assert(m("L1") === ((Some(10L), Some("R10"))), "tie at equal ts is inclusive")
    assert(m("L2") === ((Some(15L), Some("R15"))), "latest prior, not first")
    assert(m("L0") === ((None, None)), "null-ts right row must not leak payload")
    assert(m("L3") === ((Some(40L), Some("R40"))))
    assert(m("LN") === ((None, None)), "null left ts never matches")
  }

  test("tolerance boundary is inclusive; expired matches null but rows stay") {
    import org.apache.spark.sql.functions.lit
    // L2 at ts=20 matches R15 at 15; staleness 5 → 15 >= 20-5 keeps it
    val kept = matches(AsOfJoin.asofBackward(leftDf, rightDf, Seq("k"),
      "ts", "rts", Seq("rtag", "rval"), tolerance = Some(lit(5L))))
    assert(kept("L2") === ((Some(15L), Some("R15"))), "boundary match kept (>=)")
    // staleness 4 → 15 < 16 expires the match; row itself stays
    val expired = AsOfJoin.asofBackward(leftDf, rightDf, Seq("k"),
      "ts", "rts", Seq("rtag", "rval"), tolerance = Some(lit(4L)))
    assert(expired.count() === 5L)
    val e = matches(expired)
    assert(e("L2") === ((None, None)), "expired match nulls out")
    assert(e("L1") === ((Some(10L), Some("R10"))), "zero-staleness tie survives")
  }

  test("null payload field rides the struct instead of falling back") {
    val right = Seq(
      ("a", Some(10L), Some("R10"), Some(1.0)),
      ("a", Some(15L), None: Option[String], Some(2.0)) // null rtag at 15
    ).toDF("k", "rts", "rtag", "rval")
    val m = matches(AsOfJoin.asofBackward(leftDf, right, Seq("k"),
      "ts", "rts", Seq("rtag", "rval")))
    // L2's match IS the ts=15 row; its null rtag must not resurrect R10's
    assert(m("L2") === ((Some(15L), None)))
  }

  test("forward direction: earliest at-or-after, ties inclusive, nulls never match") {
    val out = AsOfJoin.asofForward(leftDf, rightDf, Seq("k"), "ts", "rts",
      Seq("rtag", "rval"))
    assert(out.count() === 5L)
    val m = matches(out)
    assert(m("L0") === ((Some(10L), Some("R10"))), "earliest following, not any")
    assert(m("L1") === ((Some(10L), Some("R10"))), "tie at equal ts is inclusive")
    assert(m("L2") === ((None, None)), "nothing after ts=20 for key a")
    assert(m("L3") === ((None, None)), "key b's only right row is in the past")
    assert(m("LN") === ((None, None)), "null left ts never matches")
  }

  test("forward tolerance bounds how far ahead the match may be") {
    import org.apache.spark.sql.functions.lit
    // L0 at ts=5 -> R10 at 10; tolerance 5 keeps it (inclusive), 4 expires
    val kept = matches(AsOfJoin.asofForward(leftDf, rightDf, Seq("k"),
      "ts", "rts", Seq("rtag", "rval"), tolerance = Some(lit(5L))))
    assert(kept("L0") === ((Some(10L), Some("R10"))))
    val expired = matches(AsOfJoin.asofForward(leftDf, rightDf, Seq("k"),
      "ts", "rts", Seq("rtag", "rval"), tolerance = Some(lit(4L))))
    assert(expired("L0") === ((None, None)))
    assert(expired("L1") === ((Some(10L), Some("R10"))), "zero-distance tie survives")
  }

  test("range-bucketed formulation equals the window formulation with tolerance") {
    import org.apache.spark.sql.functions._
    // real data: clicks <- latest purchase per user on the sf0.001 events,
    // both physical strategies, 1-hour staleness (forces plenty of nulls,
    // boundary hits, and cross-bucket matches)
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val left = ev.filter(col("event_type") === "click")
      .select("event_id", "user_id", "ts", "value")
    val right = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id").as("pid"))
    val win = AsOfJoin.asofBackward(left, right, Seq("user_id"), "ts", "ts",
      Seq("pid"), tolerance = Some(expr("INTERVAL 3600 SECOND")))
    val rng = AsOfJoin.asofBackwardRangeBucketed(left, right, Seq("user_id"),
      "ts", "ts", Seq("pid"), leftId = "event_id", toleranceSec = 3600L)
    assert(win.count() === rng.count())
    assert(win.exceptAll(rng).isEmpty && rng.exceptAll(win).isEmpty,
      "two strategies, one answer")
    assert(win.filter(col("asof_pid").isNotNull).count() > 0,
      "equality must be exercised by real matches")
  }

  test("forward range-bucketed equals the forward window formulation") {
    import org.apache.spark.sql.functions._
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val left = ev.filter(col("event_type") === "click")
      .select("event_id", "user_id", "ts", "value")
    val right = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id").as("pid"))
    val win = AsOfJoin.asofForward(left, right, Seq("user_id"), "ts", "ts",
      Seq("pid"), tolerance = Some(expr("INTERVAL 3600 SECOND")))
    val rng = AsOfJoin.asofForwardRangeBucketed(left, right, Seq("user_id"),
      "ts", "ts", Seq("pid"), leftId = "event_id", toleranceSec = 3600L)
    assert(win.count() === rng.count())
    assert(win.exceptAll(rng).isEmpty && rng.exceptAll(win).isEmpty,
      "two strategies, one answer (forward)")
    assert(win.filter(col("asof_pid").isNotNull).count() > 0,
      "equality must be exercised by real matches")
  }

  test("forward range-bucketed: inclusive ends, cross-bucket, earliest wins") {
    import org.apache.spark.sql.functions.col
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val left = Seq(
      (1L, "k", t("2024-01-01 08:00:00")),  // boundary: right at exactly +1h
      (2L, "k", t("2024-01-01 07:59:59")),  // right now beyond 1h -> null
      (3L, "k", t("2024-01-01 09:00:00")),  // zero-distance tie matches
      (4L, "k", t("2024-01-01 08:30:30"))   // cross-bucket match
    ).toDF("id", "k", "ts")
    val right = Seq(("k", t("2024-01-01 09:00:00"), "r1"),
      ("k", t("2024-01-01 09:20:00"), "r2")) // r1 must win as the earliest
      .toDF("k", "rts", "tag")
    val out = AsOfJoin.asofForwardRangeBucketed(left, right, Seq("k"),
      "ts", "rts", Seq("tag"), leftId = "id", toleranceSec = 3600L)
      .select("id", "asof_tag").as[(Long, Option[String])].collect().toMap
    assert(out === Map(1L -> Some("r1"), 2L -> None, 3L -> Some("r1"),
      4L -> Some("r1")))
  }

  test("range-bucketed: exact boundary is inclusive, cross-bucket match works") {
    import org.apache.spark.sql.functions.col
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val left = Seq(
      (1L, "k", t("2024-01-01 10:00:00")),  // boundary: right at exactly -1h
      (2L, "k", t("2024-01-01 10:30:01")),  // right now older than 1h -> null
      (3L, "k", t("2024-01-01 09:00:30"))   // same-bucket match
    ).toDF("id", "k", "ts")
    val right = Seq(("k", t("2024-01-01 09:00:00"), "r1"))
      .toDF("k", "rts", "tag")
    val out = AsOfJoin.asofBackwardRangeBucketed(left, right, Seq("k"),
      "ts", "rts", Seq("tag"), leftId = "id", toleranceSec = 3600L)
      .select("id", "asof_tag").as[(Long, Option[String])].collect().toMap
    assert(out === Map(1L -> Some("r1"), 2L -> None, 3L -> Some("r1")))
  }

  test("randomized: both directions equal a pure-Scala oracle") {
    // 400 probes x 6 keys x 250 unique (key, ts) right rows, seeded —
    // the oracle is computed in plain Scala, independent of any Spark
    // formulation (window, join, or aggregate)
    val rnd = new scala.util.Random(7)
    val leftRows = (1 to 400).map(i =>
      (i.toLong, rnd.nextInt(6).toString, rnd.nextInt(500).toLong))
    val rightRows = rnd.shuffle(
        (0 until 6).flatMap(k => (0 until 500 by 3).map(t => (k.toString, t.toLong))))
      .take(250).zipWithIndex.map { case ((k, t), i) => (k, t, s"p$i") }
    val byKey = rightRows.groupBy(_._1)

    val left = leftRows.toDF("id", "k", "ts")
    val right = rightRows.toDF("k", "rts", "tag")

    val back = AsOfJoin.asofBackward(left, right, Seq("k"), "ts", "rts",
        Seq("tag"))
      .select("id", "asof_rts", "asof_tag")
      .as[(Long, Option[Long], Option[String])].collect()
    assert(back.length === 400)
    back.foreach { case (id, rts, tag) =>
      val (_, k, ts) = leftRows(id.toInt - 1)
      val expect = byKey.getOrElse(k, Nil).filter(_._2 <= ts)
        .sortBy(_._2).lastOption
      assert(rts === expect.map(_._2) && tag === expect.map(_._3),
        s"backward mismatch at id=$id k=$k ts=$ts")
    }

    val fwd = AsOfJoin.asofForward(left, right, Seq("k"), "ts", "rts",
        Seq("tag"))
      .select("id", "asof_rts", "asof_tag")
      .as[(Long, Option[Long], Option[String])].collect()
    assert(fwd.length === 400)
    fwd.foreach { case (id, rts, tag) =>
      val (_, k, ts) = leftRows(id.toInt - 1)
      val expect = byKey.getOrElse(k, Nil).filter(_._2 >= ts)
        .sortBy(_._2).headOption
      assert(rts === expect.map(_._2) && tag === expect.map(_._3),
        s"forward mismatch at id=$id k=$k ts=$ts")
    }
  }

  test("column-collision guards fail fast") {
    intercept[IllegalArgumentException] {
      AsOfJoin.asofBackward(leftDf, rightDf, Seq("k"), "ts", "rts",
        Seq("rts", "rval")) // payload repeats rightTs
    }
    intercept[IllegalArgumentException] {
      AsOfJoin.asofBackward(leftDf.withColumnRenamed("ltag", "asof_rtag"),
        rightDf, Seq("k"), "ts", "rts", Seq("rtag")) // prefixed name clashes
    }
  }
}
