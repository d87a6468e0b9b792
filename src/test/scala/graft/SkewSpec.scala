package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SkewJoin

/** Heavy-hitter mechanics (SURVEY.md scale posture): the salted join
  * equals the plain join row-for-row while spreading a hot key, and
  * Spark's AQE skew-join actually splits an oversized partition under
  * this library's recommended session settings.
  */
class SkewSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("saltedInner equals the plain inner join on heavily skewed data") {
    // one key carries 20k rows (the straggler shape), others are uniform
    val left = ((1 to 20000).map(i => (0L, i.toLong)) ++
      (1 to 2000).map(i => ((i % 50 + 1).toLong, i.toLong)))
      .toDF("k", "v")
    val right = (0 to 50).map(i => (i.toLong, s"dim_$i")).toDF("k", "name")

    val plain = left.join(right, "k").select("k", "v", "name")
    val salted = SkewJoin.saltedInner(left, right, "k", salt = 8)
      .select("k", "v", "name")
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
    assert(salted.count() === 22000L)

    // the hot key's rows really do take multiple salt values
    val saltSpread = left.withColumn("_salt",
        pmod(xxhash64(left.columns.map(col): _*), lit(8L)))
      .filter(col("k") === 0L).select("_salt").distinct().count()
    assert(saltSpread > 1, "hot key must spread over multiple salts")
  }

  test("AQE splits a skewed sort-merge join partition at runtime") {
    val conf = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // shrink the thresholds so test-scale data counts as skewed
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val old = conf.map { case (k, _) => k -> spark.conf.getOption(k) }
    conf.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val left = ((1 to 60000).map(i => (0L, s"payload_$i")) ++
        (1 to 4000).map(i => ((i % 40 + 1).toLong, s"p_$i"))).toDF("k", "v")
      val right = (0 to 40).flatMap(i => Seq.fill(200)((i.toLong, s"dim_$i")))
        .toDF("k", "name")
      val joined = left.join(right, "k")
      // collect() (not count()) — count builds a SEPARATE query execution;
      // only executing THIS one finalizes its adaptive plan
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin(skew=true)") &&
        plan.contains("AQEShuffleRead skewed"),
        s"AQE did not split the skewed partition:\n${plan.take(2000)}")
    } finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
