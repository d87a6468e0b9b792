package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextAnalysis
import graft.operators.SequencePack

class SequencePackSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def tokens = TextAnalysis
    .withTokenCounts(Tables.documents(spark, sf))
    .select(col("doc_id"), col("ws_tokens"))

  test("two-phase distributed prefix sum equals the single-task window") {
    // forcing few buckets exercises multiple bucket boundaries even at
    // tiny sf; the naive formulation is the spec, not the implementation
    val naive = tokens
      .withColumn("offset", coalesce(sum(col("ws_tokens")).over(
        Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)),
        lit(0)).cast("long"))
      .withColumn("bin", floor(col("offset") / 2048).cast("long"))
      .select("doc_id", "offset", "bin")
    val fast = SequencePack.packOffsets(tokens, buckets = 7)
      .select("doc_id", "offset", "bin")
    assert(fast.exceptAll(naive).isEmpty && naive.exceptAll(fast).isEmpty)
  }

  test("offsets are a strictly consistent running total") {
    val rows = SequencePack.packOffsets(tokens, buckets = 5)
      .orderBy("doc_id")
      .select(col("ws_tokens").cast("long"), col("offset"))
      .collect()
    var acc = 0L
    rows.foreach { r =>
      assert(r.getLong(1) === acc, "offset must equal sum of prior tokens")
      acc += r.getLong(0)
    }
  }

  test("empty input keeps the schema contract") {
    val empty = SequencePack.packOffsets(tokens.filter(lit(false)))
    assert(empty.columns.toSeq === Seq("doc_id", "ws_tokens", "offset", "bin"))
    assert(empty.count() === 0)
  }
}
