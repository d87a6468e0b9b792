package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan hygiene gate over the whole query contract: no query may plan a
  * cartesian product or nested-loop join unless it is one of the
  * documented all-pairs baselines. Catches a regressions class that
  * row-level oracles cannot (results stay right while the plan goes
  * quadratic).
  */
class PlanAuditSpec extends AnyFunSuite with SparkTestBase {

  /** All-pairs by design: brute-force scoring paths whose non-equi pair
    * predicates (id < id, id != id, lit(true)) have no shuffle key.
    */
  private val allPairsByDesign = Set(
    "dedup_embedding_cosine", // exact O(n^2) baseline
    "ann_bruteforce_topk",    // |q| x corpus exact baseline
    "ann_hard_negatives",     // same |q| x corpus baseline + label filter
                              // (corpus x 16-centroid broadcast assignment)
    "knn_label_assign",       // vote over the same |q| x corpus baseline
                              // (the IVF/banded retrieval composes equi)
    "ann_topk_agg",           // same all-pairs scoring, aggregator ranking
    "ann_ivf_topk",           // corpus x centroids assignment (broadcast)
    "ann_ivf_trained_topk",   // same corpus x centroids broadcast, trained cells
    "ann_ivfpq_topk",         // same constant-size centroid broadcast; scoring itself is equi
    "ann_planted_check",      // |q| x corpus exact baseline (planted queries)
    "ann_corpus_isotropy",    // bounded id-range pair sample (<=2000^2/2 at any
                              // SF) + the |q| x corpus baseline + 1x1 stat join
    "ann_pq_topk",            // |q| x corpus CODE scoring (8 adds/pair by design)
    "ann_pq_trained_topk",    // same |q| x corpus code scoring, trained codebook
    "report_metadata",        // 1-row x 1-row metadata crossJoin
    "doc_bm25_relevance",     // 1-row corpus-stats (N, avgdl) broadcast crossJoin
    "search_bm25_topk",       // same 1-row corpus-stats broadcast crossJoin;
                              // query-doc matching itself is term-equi
    "doc_nb_classify",        // |labels|-row broadcast label fan-out (the
                              // classifier's k, not data); scoring is equi
    "doc_unigram_logprob",    // 1-row token-total broadcast crossJoin
    "doc_bigram_logprob",     // same 1-row token-total broadcast crossJoin
    "doc_tfidf_topterms",     // 1-row corpus-size (N) broadcast crossJoin
    "dedup_tfidf_cosine",     // same 1-row N broadcast; pair join is term-equi
    "cms_token_freq",         // 1-row r-cardinality guard broadcast crossJoin
                              // (FreqSketch.estimate depth validation, r16)
    "cms_incremental_final"   // same 1-row guard crossJoin
  )

  test("no unintentional cartesian/nested-loop joins across the contract") {
    val sf = "/root/testdata/sf0.001"
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val plan = fn(spark, sf).queryExecution.executedPlan.toString
      val nested = plan.contains("BroadcastNestedLoopJoin") ||
        plan.contains("CartesianProduct")
      if (nested && !allPairsByDesign.contains(name)) Some(name) else None
    }
    assert(offenders.isEmpty,
      s"unexpected nested-loop/cartesian plans in: ${offenders.mkString(", ")}")
  }

  test("no partitionless window over the corpus in any contract query") {
    // a Window with an empty partition spec funnels its ENTIRE input
    // through one task — the pack_documents scale-killer class. Checked
    // on the optimized logical plan (stable under AQE re-planning).
    val sf = "/root/testdata/sf0.001"
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val bad = fn(spark, sf).queryExecution.optimizedPlan.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window
            if w.partitionSpec.isEmpty => w
      }
      if (bad.nonEmpty) Some(name) else None
    }
    assert(offenders.isEmpty,
      s"partitionless Window plans in: ${offenders.mkString(", ")}")
  }

  test("source filters reach the parquet scan (PushedFilters non-empty)") {
    // the queries whose filters are expressible as parquet data filters;
    // a regression that buries the predicate behind a non-pushable
    // projection re-reads the full table at 100 TB
    val mustPush = Seq("trip_type_filter", "validated_events",
      "customers_with_urgent_orders")
    val sf = "/root/testdata/sf0.001"
    val pushedRe = """PushedFilters: \[[^\]]""".r
    val offenders = mustPush.filterNot { name =>
      val plan = SparkEntry.queries(name)(spark, sf)
        .queryExecution.executedPlan.toString
      pushedRe.findFirstIn(plan).isDefined
    }
    assert(offenders.isEmpty,
      s"no non-empty PushedFilters in the scans of: ${offenders.mkString(", ")}")
  }

  test("tiered range join plans as equi-joins + union, never a nested loop") {
    val plan = SparkEntry.queries("lineitems_in_window_tiered")(
        spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"tiered range join must stay equi-bucketed:\n${plan.take(2000)}")
    assert(plan.contains("Union"), "the two width tiers must union")
    // both tiers join on the synthetic bucket key
    assert("_bkt".r.findAllIn(plan).length >= 2,
      "both tier joins must key on the time bucket")
  }

  test("image_dims runs inside WholeStageCodegen (no interpreted fallback)") {
    // the decode expression generates a single static call via
    // defineCodeGen; if it ever falls out of codegen the whole media
    // scan pays interpreted-projection overhead per row
    val df = SparkEntry.queries("media_image_dims")(
      spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    // the `*(n)` prefix marks operators fused into a WholeStageCodegen
    // stage; the projection evaluating image_dims must carry it
    val decodeLine = plan.linesIterator
      .find(_.contains("image_dims")).getOrElse("")
    assert(decodeLine.trim.matches("""^(\+- )?\*\(\d+\) .*"""),
      s"the image_dims projection is outside codegen: $decodeLine")
  }

  test("perceptual_hash runs inside WholeStageCodegen (no interpreted fallback)") {
    val df = SparkEntry.queries("media_phash")(
      spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    val decodeLine = plan.linesIterator
      .find(_.contains("perceptual_hash")).getOrElse("")
    assert(decodeLine.trim.matches("""^(\+- )?\*\(\d+\) .*"""),
      s"the perceptual_hash projection is outside codegen: $decodeLine")
  }

  test("audio_fingerprint runs inside WholeStageCodegen (no interpreted fallback)") {
    val df = SparkEntry.queries("media_audio_fp")(
      spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    val decodeLine = plan.linesIterator
      .find(_.contains("audio_fingerprint")).getOrElse("")
    assert(decodeLine.trim.matches("""^(\+- )?\*\(\d+\) .*"""),
      s"the audio_fingerprint projection is outside codegen: $decodeLine")
  }

  test("incremental dedup's corpus band relation shuffles ids only, no vectors/sigs") {
    // the 100 TB property: the big (corpus) side of the band join must
    // not carry signature arrays through the exchange — candidate ids
    // travel alone and signatures re-attach in the scoring joins
    val sf = "/root/testdata/sf0.001"
    val plan = SparkEntry.queries("dedup_incremental_pairs")(spark, sf)
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    // the candidate-dedup aggregate groups on BARE ids and outputs
    // nothing else (a sig/vector column here would ride the widest
    // shuffle of the operator)
    val candAgg = """Aggregate \[id_a#\d+L?, id_b#\d+L?\], \[id_a#\d+L?, id_b#\d+L?\]""".r
    assert(candAgg.findFirstIn(plan).isDefined,
      s"candidate distinct must carry only (id_a, id_b):\n${plan.take(3000)}")
  }

  test("media decode queries are map-only: no Exchange anywhere in the plan") {
    // decode/resize/frame stages are per-row projections over the scan;
    // any shuffle here would mean moving raw media bytes across the
    // cluster — the single most expensive mistake a 100 TB media
    // pipeline can make
    val sf = "/root/testdata/sf0.001"
    val mediaQueries = Seq("media_metadata", "media_frames",
      "media_image_dims", "media_wav_meta", "media_resize_stride",
      "media_phash", "media_mp4_meta", "media_audio_fp")
    val offenders = mediaQueries.filter { name =>
      SparkEntry.queries(name)(spark, sf)
        .queryExecution.executedPlan.toString.contains("Exchange")
    }
    assert(offenders.isEmpty,
      s"media stages must not shuffle payload bytes: ${offenders.mkString(", ")}")
  }

  test("revenue_by_nation broadcasts its dimension joins") {
    // nation and region are O(10^2) rows at any SF — shuffling the fact
    // table against them would be the classic 100 TB join mistake; the
    // broadcast() hints must survive planning
    val plan = SparkEntry.queries("revenue_by_nation")(
        spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    val broadcasts = "BroadcastHashJoin".r.findAllIn(plan).length
    assert(broadcasts >= 2,
      s"expected >=2 BroadcastHashJoin (nation, region), found $broadcasts in:\n$plan")
  }

  test("skewed_user_join shuffles on (user_id, _salt), not a broadcast") {
    val plan = SparkEntry.queries("skewed_user_join")(
        spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    val shuffled = plan.contains("ShuffledHashJoin") ||
      plan.contains("SortMergeJoin")
    assert(shuffled, s"salted join must be a shuffle join, got:\n${plan.take(2000)}")
    // the join keys carry the salt: the ShuffledHashJoin keys line lists
    // both user_id and _salt
    val keysLine = plan.linesIterator
      .find(l => l.contains("ShuffledHashJoin") || l.contains("SortMergeJoin"))
      .getOrElse("")
    assert(keysLine.contains("user_id") && keysLine.contains("_salt"),
      s"join keys must include the salt, got: $keysLine")
  }

  test("runtime bloom filter prunes the probe side of a selective shuffle join") {
    // Spark's InjectRuntimeFilter builds a bloom filter over the
    // FILTERED build side's join keys and semi-filters the probe side
    // BEFORE its shuffle — at 100 TB the difference between shuffling
    // the full fact table and shuffling the matching slice. The engine
    // does this automatically once the size conditions hold; this gate
    // pins the conditions so a conf/default drift can't silently lose
    // the optimization.
    import org.apache.spark.sql.functions.col
    val confs = Map(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force a shuffle join
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0")
    val saved = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val dir = "/root/testdata/sf0.001"
      val plan = Tables.lineitem(spark, dir)
        .join(Tables.orders(spark, dir)
          .filter(col("o_orderpriority") === "1-URGENT"),
          col("l_orderkey") === col("o_orderkey"))
        .select("l_orderkey", "l_extendedprice")
        .queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain") && plan.contains("bloom_filter_agg"),
        s"runtime bloom filter not injected:\n${plan.take(2000)}")
    } finally {
      saved.foreach { case (k, v) => v match {
        case Some(x) => spark.conf.set(k, x)
        case None => spark.conf.unset(k)
      } }
    }
  }

  test("every query result is non-empty at sf0.01 (the driver's oracle SF)") {
    // Must run at the SAME scale factor the driver's DuckDB comparison
    // uses: r6's ann_lsh_banded_topk was non-empty at sf0.001 (a lucky
    // embedding draw collided) yet 0-rows-vs-0-rows at the driver's
    // sf0.01 — a vacuous green this gate at the wrong SF couldn't catch.
    val sf = "/root/testdata/sf0.01"
    val empty = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      if (fn(spark, sf).limit(1).count() == 0) Some(name) else None
    }
    assert(empty.isEmpty, s"empty results at sf0.01: ${empty.mkString(", ")}")
  }

  test("oracleSql keys are a subset of queries and name every column consistently") {
    val qs = SparkEntry.queries.keySet
    val orphans = SparkEntry.oracleSql.keySet.diff(qs)
    assert(orphans.isEmpty, s"oracleSql without a query: ${orphans.mkString(", ")}")
    val noOracle = qs.diff(SparkEntry.oracleSql.keySet)
    // every query carries an oracle (approx_distinct_users_daily's is the
    // bounds-check shape: exact counts + approx_ok band flag)
    assert(noOracle.isEmpty,
      s"queries silently missing an oracle: ${noOracle.mkString(", ")}")
  }
}
