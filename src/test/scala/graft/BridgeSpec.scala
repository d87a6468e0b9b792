package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge
import org.scalatest.funsuite.AnyFunSuite

/** Bridge.severOrigin: same rows/schema, preserved partitioning, and —
  * the reason it exists — bounded per-round cost in iterated
  * checkpoint fixpoints whose round plan self-joins the previous round
  * (origin stats/constraint closures otherwise nest per round and
  * driver analysis time doubles; measured 0.5 s → 344 s by round 26 on
  * a 19k-row no-op loop).
  */
class BridgeSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("severOrigin: identical rows and schema, analyzed plan is a leaf") {
    val df = (1L to 100L).map(i => (i, s"v$i")).toDF("id", "v")
      .filter(col("id") % 3 =!= 0)
    val ck = df.localCheckpoint()
    val sev = Bridge.severOrigin(ck)
    assert(sev.schema == ck.schema)
    assert(sev.collect().toSet == ck.collect().toSet)
    assert(sev.queryExecution.analyzed.children.isEmpty,
      "severed frame must be a leaf relation")
  }

  test("severOrigin preserves the checkpointed partitioning (no re-shuffle)") {
    // under AQE, localCheckpoint itself records UnknownPartitioning (the
    // adaptive plan's partitioning isn't final at checkpoint time) — so
    // pin the sever's copy path where checkpoint DOES record one
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = (1L to 200L).map(i => (i % 7, i)).toDF("k", "v")
        .repartition(8, col("k"))
      val ck = df.localCheckpoint()
      val ckPart = ck.queryExecution.analyzed
        .asInstanceOf[org.apache.spark.sql.execution.LogicalRDD]
        .outputPartitioning
      assert(ckPart.toString.startsWith("hashpartitioning"),
        s"precondition: checkpoint recorded $ckPart")
      val sev = Bridge.severOrigin(ck)
      // sever remints exprIds (see the self-join test below), so compare
      // the partitioning structurally, modulo the id digits
      def shape(p: Any): String = p.toString.replaceAll("#\\d+", "#_")
      assert(shape(sev.queryExecution.analyzed
        .asInstanceOf[org.apache.spark.sql.execution.LogicalRDD]
        .outputPartitioning) == shape(ckPart),
        "sever must carry the checkpoint's partitioning shape")
      // aggregating on the pre-partitioned key must not add an Exchange
      val plan = sev.groupBy("k").agg(sum("v")).queryExecution
        .executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"aggregate on the pre-partitioned key re-shuffled:\n$plan")
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqe)
  }

  test("severed frame joins cleanly against the live checkpointed original") {
    // sever mints fresh exprIds: with the origin's ids reused, this
    // join would be a duplicate-exprId self-join and either throw the
    // ambiguity error or silently resolve both sides to one relation
    val ck = (1L to 50L).map(i => (i, i * 2)).toDF("id", "v").localCheckpoint()
    val sev = Bridge.severOrigin(ck)
    val joined = ck.join(sev, ck("id") === sev("id") && ck("v") =!= sev("v"))
    assert(joined.count() == 0L, "id-equal rows always have equal v")
    assert(ck.join(sev, ck("id") === sev("id")).count() == 50L)
  }

  test("30-round self-join checkpoint loop stays flat (the doubling regression)") {
    var cur = (1L to 500L).map(i => (i % 50, i)).toDF("id", "v")
      .localCheckpoint().transform(Bridge.severOrigin)
    val t0 = System.nanoTime()
    for (_ <- 1 to 30) {
      // a round that references `cur` TWICE — the nesting trigger
      val agg = cur.groupBy("id").agg(max(col("v")).as("mx"))
      cur = cur.join(agg, Seq("id"))
        .select(col("id"), greatest(col("v"), col("mx")).as("v"))
        .localCheckpoint().transform(Bridge.severOrigin)
    }
    val secs = (System.nanoTime() - t0) / 1e9
    // unsevered, rounds 20+ each take SECONDS and keep doubling; the
    // whole severed loop finishes in a few seconds. 60 s = pure
    // regression guard with heavy slack for loaded CI boxes.
    assert(secs < 60.0, s"30 self-join checkpoint rounds took $secs s")
    assert(cur.count() == 500L)
  }
}
