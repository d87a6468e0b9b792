package graft

import graft.functions.TextAnalysis
import graft.operators.CorpusSelect
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CorpusSelectSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def scored = TextAnalysis.withQualityScore(
      TextAnalysis.withTokenCounts(Tables.documents(spark, sf)))
    .select(col("doc_id"),
      floor(col("quality_score") * 10000).cast("long").as("q_ppm"),
      col("ws_tokens").cast("long").as("ws_tokens"))
    .withColumn("_ord",
      (lit(10000L) - col("q_ppm")) * lit(1L << 41) + col("doc_id"))

  private def naive(budget: Long) = scored
    .withColumn("cum_before", coalesce(sum(col("ws_tokens")).over(
      Window.orderBy("_ord").rowsBetween(Window.unboundedPreceding, -1)),
      lit(0L)).cast("long"))
    .filter(col("cum_before") < budget)

  test("two-phase budget select equals the single-task window") {
    // few buckets => several bucket boundaries land inside the kept set,
    // exercising the offset stitching; budget mid-corpus so pruning and
    // the boundary doc both occur
    for (budget <- Seq(1L, 5000L, 16000L)) {
      val got = CorpusSelect.budgetSelect(scored, "_ord", "ws_tokens",
          budget, buckets = 7)
        .select("doc_id", "cum_before").collect().map(r => (r.getLong(0), r.getLong(1))).sorted
      val want = naive(budget)
        .select("doc_id", "cum_before").collect().map(r => (r.getLong(0), r.getLong(1))).sorted
      assert(got.toSeq == want.toSeq, s"budget=$budget")
    }
  }

  test("boundary document is kept and the budget binds") {
    val budget = 16000L
    val kept = CorpusSelect.budgetSelect(scored, "_ord", "ws_tokens", budget)
      .select("cum_before", "ws_tokens").collect()
    assert(kept.nonEmpty)
    val maxBefore = kept.map(_.getLong(0)).max
    assert(maxBefore < budget) // every kept row started under budget
    // the kept set crosses the budget (greedy takes the boundary doc)
    assert(kept.map(_.getLong(1)).sum >= budget)
    // and is a strict subset of the corpus
    assert(kept.length < scored.count())
  }

  test("bucket pruning drops out-of-budget buckets before the shuffle") {
    // with budget tiny and many buckets, the broadcast offset table must
    // carry only the live prefix — observable as a result unchanged by
    // bucket count while the full-corpus sum far exceeds the budget
    val a = CorpusSelect.budgetSelect(scored, "_ord", "ws_tokens", 100L,
      buckets = 2).select("doc_id").collect().map(_.getLong(0)).sorted
    val b = CorpusSelect.budgetSelect(scored, "_ord", "ws_tokens", 100L,
      buckets = 251).select("doc_id").collect().map(_.getLong(0)).sorted
    assert(a.toSeq == b.toSeq)
  }

  test("per-group budget select equals the per-group window; groups independent") {
    val scored = TextAnalysis.withQualityScore(
        TextAnalysis.withTokenCounts(Tables.documents(spark, sf)))
      .select(col("doc_id"), col("lang"),
        floor(col("quality_score") * 10000).cast("long").as("q_ppm"),
        col("ws_tokens").cast("long").as("ws_tokens"))
      .withColumn("_ord",
        (lit(10000L) - col("q_ppm")) * lit(1L << 41) + col("doc_id"))
    for (budget <- Seq(500L, 2000L)) {
      val got = CorpusSelect.budgetSelectPerGroup(scored, "lang", "_ord",
          "ws_tokens", budget, buckets = 7)
        .select("doc_id", "cum_before").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted
      val naivePg = scored
        .withColumn("cum_before", coalesce(sum(col("ws_tokens")).over(
          Window.partitionBy("lang").orderBy("_ord")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)).cast("long"))
        .filter(col("cum_before") < budget)
        .select("doc_id", "cum_before").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted
      assert(got.toSeq == naivePg.toSeq, s"budget=$budget")
    }
    // every group is represented: no language starves another's budget
    val langs = CorpusSelect.budgetSelectPerGroup(scored, "lang", "_ord",
        "ws_tokens", 500L)
      .select("lang").distinct().collect().map(_.getString(0)).toSet
    assert(langs == scored.select("lang").distinct()
      .collect().map(_.getString(0)).toSet)
  }

  test("leakage-safe split keeps near-dup clusters in one split") {
    import graft.operators.{CorpusSelect, Dedup}
    val d = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
    // every 20th doc duplicated with a 2-token suffix (near dup)
    val corpus = d.unionByName(d.filter(col("doc_id") % 20 === 0)
      .select((col("doc_id") + 100000L).as("doc_id"),
        concat(col("text"), lit(" extradup token")).as("text")))
    val clusters = Dedup.nearDupClusters(
      Dedup.jaccardPairs(corpus, n = 3, threshold = 0.5)
        .select("id_a", "id_b"))
    val split = CorpusSelect.leakageSafeSplit(corpus, clusters)

    // property 1: all members of a cluster share the split
    val clustered = split.join(clusters.withColumnRenamed("id", "doc_id"),
        Seq("doc_id"))
      .groupBy("cluster_id").agg(countDistinct("split").as("n"),
        count(lit(1)).as("sz"))
      .collect()
    assert(clustered.nonEmpty && clustered.forall(_.getLong(2) >= 2))
    assert(clustered.forall(_.getLong(1) == 1L),
      "a near-dup cluster straddles splits")

    // property 2: singletons match the plain hash split of their own text
    val plain = corpus
      .withColumn("bucket2", graft.functions.TextHash.hash60(col("text")) % 100)
    val single = split.join(clusters.select(col("id").as("doc_id")),
        Seq("doc_id"), "left_anti")
      .join(plain.select("doc_id", "bucket2"), Seq("doc_id"))
    assert(single.filter(col("bucket") =!= col("bucket2")).count() == 0)
  }

  test("empty input keeps the schema contract") {
    val empty = scored.filter(lit(false))
    val out = CorpusSelect.budgetSelect(empty, "_ord", "ws_tokens", 100L)
    assert(out.columns.contains("cum_before"))
    assert(out.count() == 0)
  }
}
