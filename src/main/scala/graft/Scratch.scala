package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.functions._

/** Throwaway optimization-round profiler (NOT part of the driver
  * contract): counts Spark jobs and wall time for labeled phases of a
  * query chain. Usage: runMain graft.Scratch [sfDir]
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val what = args.lift(1).getOrElse("c4")
    val spark = GraftSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onJobEnd(j: SparkListenerJobEnd): Unit = ()
    })
    def phase[T](name: String)(body: => T): T = {
      val j0 = jobs.get(); val t0 = System.nanoTime()
      val r = body
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"SCRATCH $name%-28s jobs=${jobs.get() - j0}%3d wall=$secs%7.3f")
      r
    }
    if (what == "plans") {
      // dump the c4 chain's INTERNAL stage plans (the committed query
      // plans only show the post-checkpoint tail): the S3+S4 unit pass
      // and the splitAndPack head, before vs after the r21 fusion
      val outDir = args.lift(2).getOrElse("/root/repo/plans/r21_stage")
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
      import graft.operators.{CurationPipeline, Dedup}
      val docs = Tables.documents(spark, sfDir)
        .select(col("doc_id"), col("text"))
      val st = CurationPipeline.stages(docs.withColumn("html",
        concat(lit("<html><body><p>"), col("text"), lit("</p></body></html>")))
        .select(col("doc_id"), col("html")))
      def dump(name: String, df: org.apache.spark.sql.DataFrame): Unit =
        java.nio.file.Files.write(
          java.nio.file.Paths.get(outDir, s"$name.txt"),
          df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode).getBytes("UTF-8"))
      // the UNIT PASS relation itself, un-checkpointed (the committed
      // query plans only show post-checkpoint tails): before = the
      // chained dropBoilerplateUnits ∘ dedupUnitsWithinDocs operators,
      // after = the fused dropBoilerThenDedupUnits — pick whichever this
      // tree has (reflection keeps one Scratch source valid in both)
      val curated = st.curated
      val fused = try {
        val m = Dedup.getClass.getDeclaredMethods
          .find(_.getName == "dropBoilerThenDedupUnits")
        m.map(_.invoke(Dedup, curated, Long.box(3L), "\\.\\s+", "doc_id",
          "text").asInstanceOf[org.apache.spark.sql.DataFrame])
      } catch { case _: Throwable => None }
      val unitPass = fused.getOrElse(
        Dedup.dedupUnitsWithinDocs(
          Dedup.dropBoilerplateUnits(curated, 3L)
            .select(col("doc_id"), col("text_clean").as("text"))))
      dump("c4_unit_pass", unitPass)
      val clusters = Dedup.nearDupClusters(
        Dedup.jaccardPairs(st.unitDeduped, n = 3, threshold = 0.5,
          maxDocFreq = Some(100L)).select("id_a", "id_b"))
      dump("c4_split_and_pack",
        CurationPipeline.splitAndPack(st.unitDeduped, clusters, "doc_id", 2048L))
      // the splitAndPack HEAD before the two-phase pack's own
      // checkpoint: before = withTokenCounts(kept) ⋈ leakageSafeSplit ⋈
      // by id; after = withTokenCounts(kept) + a map-only split column
      val kept = Dedup.dropNearDups(st.unitDeduped, clusters, "doc_id")
      val head = fused match {
        case Some(_) =>
          // reflective: these helpers only exist in the after tree
          val cs = graft.operators.CorpusSelect
          def call(n: String, args: AnyRef*) = cs.getClass.getDeclaredMethods
            .find(_.getName == n).get.invoke(cs, args: _*)
            .asInstanceOf[org.apache.spark.sql.Column]
          val bucket = call("splitBucket", col("text"))
          val split = call("splitOfBucket", bucket, Int.box(80), Int.box(10))
          graft.functions.TextAnalysis.withTokenCounts(kept)
            .withColumn("split", split)
            .select(col("doc_id"), col("split"),
              col("ws_tokens").cast("long").as("ws_tokens"))
        case None =>
          graft.functions.TextAnalysis.withTokenCounts(kept)
            .join(graft.operators.CorpusSelect
              .leakageSafeSplit(st.unitDeduped, clusters, "doc_id")
              .select(col("doc_id"), col("split")), Seq("doc_id"))
            .select(col("doc_id"), col("split"),
              col("ws_tokens").cast("long").as("ws_tokens"))
      }
      dump("c4_pack_head", head)
      spark.stop(); return
    }
    if (what == "store2") {
      SparkEntry.entry(spark).count()
      import graft.streaming.TripStore
      val starts = Tables.orders(spark, sfDir).select(
        col("o_orderkey").cast("string").as("trip_id"),
        lit("trip_start").as("data_type"),
        col("o_orderdate").cast("string").as("pickup_datetime"),
        col("o_totalprice").as("estimated_fare_amount"),
        lit(null).cast("string").as("dropoff_datetime"),
        lit(null).cast("double").as("fare_amount"))
      val ends = Tables.lineitem(spark, sfDir)
        .groupBy(col("l_orderkey"), col("l_shipdate"))
        .agg(min(struct(col("l_linenumber"), col("l_partkey"),
          col("l_suppkey"), col("l_extendedprice"))).as("_m"))
        .select(
          col("l_orderkey").cast("string").as("trip_id"),
          lit("trip_end").as("data_type"),
          lit(null).cast("string").as("pickup_datetime"),
          lit(null).cast("double").as("estimated_fare_amount"),
          col("l_shipdate").cast("string").as("dropoff_datetime"),
          col("_m.l_extendedprice").as("fare_amount"))
      val sAttrs = Seq("pickup_datetime", "estimated_fare_amount")
      val eAttrs = Seq("dropoff_datetime", "fare_amount")
      val completed = starts
        .select(col("trip_id"), col("pickup_datetime"), col("estimated_fare_amount"))
        .join(ends.select(col("trip_id"), col("dropoff_datetime"), col("fare_amount")),
          Seq("trip_id"))
      val raw = TripStore.rawItems(starts.unionByName(ends), sAttrs, eAttrs)
      val matcher = TripStore.matcherItems(completed, sAttrs, eAttrs)
      val ord = struct(col("status_rank"),
        coalesce(col("processed_at"), lit(""))).as("_ord")
      val rawOrd = raw.withColumn("_ord", ord)
      val matOrd = matcher.withColumn("_ord", ord)
      phase("raw items noop") {
        rawOrd.write.format("noop").mode("overwrite").save() }
      phase("matcher items noop") {
        matOrd.write.format("noop").mode("overwrite").save() }
      phase("raw probe collect") {
        rawOrd.select(org.apache.spark.sql.functions.pmod(
          xxhash64(col("trip_id")), lit(32L)).cast("int").as("b"))
          .distinct().collect() }
      val d1 = java.nio.file.Files.createTempDirectory("scr_store").toString
      phase("gen0 upsert (raw)") {
        graft.operators.KeyedUpsertSink.upsertBatch(rawOrd, d1,
          TripStore.Keys, "_ord", 0L, versionWins = true, numBuckets = 32,
          bucketCols = Seq("trip_id")) }
      phase("gen1 upsert (matcher)") {
        graft.operators.KeyedUpsertSink.upsertBatch(matOrd, d1,
          TripStore.Keys, "_ord", 1L, versionWins = true, numBuckets = 32,
          bucketCols = Seq("trip_id")) }
      println("SCRATCH phases " + graft.operators.KeyedUpsertSink
        .phaseSnapshot().toSeq.sorted.mkString(", "))
      // A/B: same two upserts with the batch lazily checkpointed by the
      // CALLER (materializes inside the probe job; merge reads blocks)
      val d2 = java.nio.file.Files.createTempDirectory("scr_store_ck").toString
      val rawCk = rawOrd.localCheckpoint(false)
      val matCk = matOrd.localCheckpoint(false)
      phase("gen0 upsert ckpt batch") {
        graft.operators.KeyedUpsertSink.upsertBatch(rawCk, d2,
          TripStore.Keys, "_ord", 0L, versionWins = true, numBuckets = 32,
          bucketCols = Seq("trip_id")) }
      phase("gen1 upsert ckpt batch") {
        graft.operators.KeyedUpsertSink.upsertBatch(matCk, d2,
          TripStore.Keys, "_ord", 1L, versionWins = true, numBuckets = 32,
          bucketCols = Seq("trip_id")) }
      spark.stop(); return
    }
    if (what == "store") {
      // session warm on an unrelated family, then time the fixture build
      SparkEntry.entry(spark).count()
      phase("tripStoreBuild") { SparkEntry.tripStoreBuild(spark, sfDir) }
      phase("trip_store_lookup") {
        SparkEntry.queries("trip_store_lookup")(spark, sfDir).count()
      }
      phase("trip_store_final") {
        SparkEntry.queries("trip_store_final")(spark, sfDir).count()
      }
      phase("trip_store_final again") {
        SparkEntry.queries("trip_store_final")(spark, sfDir).count()
      }
      spark.stop(); return
    }
    // warm
    SparkEntry.queries("c4_end_to_end")(spark, sfDir).count()
    phase("c4_end_to_end total") {
      SparkEntry.queries("c4_end_to_end")(spark, sfDir).count()
    }
    phase("c4_shards total") {
      SparkEntry.queries("c4_shards")(spark, sfDir).count()
    }
    // stage-by-stage via the public pipeline over the same corpus shape
    locally {
      import graft.operators.{CorpusSelect, CurationPipeline, Dedup, SequencePack}
      import graft.functions.TextAnalysis
      val html = phase("corpus build") {
        val d = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
        val near = d.unionByName(d.filter(col("doc_id") % 20 === 0)
          .select((col("doc_id") + 100000L).as("doc_id"),
            concat(col("text"), lit(" extradup token")).as("text")))
        // the exact c4Html wrapper (SparkEntry.c4Html inlined)
        val esc = Seq("&" -> "&amp;", "<" -> "&lt;", ">" -> "&gt;")
          .foldLeft(col("text")) { case (c, (f, t)) => replace(c, lit(f), lit(t)) }
        val wrapped = concat(
          lit("<html><head><style>p { color: #c00; }</style>" +
            "<script type=\"text/javascript\">if (x < 2 && y > 1) { alert(\"hi\"); }" +
            "</script></head><body><h1>Doc "),
          col("doc_id"),
          lit("</h1><!-- crawl artifact --><p>"),
          esc,
          lit(" &amp; more &lt;raw&gt;&nbsp;tail.</p>"),
          when(col("doc_id") % 4 === 0,
            concat(lit("<p>Limited time offer number "), col("doc_id"),
              lit(". Limited time offer number "), col("doc_id"), lit(".</p>")))
            .otherwise(lit("")),
          lit("<p>Subscribe to our newsletter for free offers.</p>" +
            "</body></html>"))
        near.select(col("doc_id"), wrapped.as("html")).localCheckpoint()
      }
      val st = CurationPipeline.stages(html)
      phase("S1+S2 curated") { st.curated.count() }
      phase("S3+S4 unitDeduped") { st.unitDeduped.count() }
      phase("S5a shingles uncapped") {
        Dedup.shingles(st.unitDeduped, n = 3, maxDocFreq = None).count()
      }
      val sh = phase("S5b shingles capped+mat") {
        val x = Dedup.shingles(st.unitDeduped, n = 3,
          maxDocFreq = Some(100L), materialize = true)
        x.count(); x
      }
      phase("S5c pair self-join+agg") {
        Dedup.jaccardFromShingles(sh, 0.5).select("id_a", "id_b").count()
      }
      phase("S5c2 again (variance)") {
        Dedup.jaccardFromShingles(sh, 0.5).select("id_a", "id_b").count()
      }
      phase("S5x join fanout rows") {
        val n = sh.as("a").join(sh.as("b"),
          col("a.shingle") === col("b.shingle") && col("a.id") < col("b.id"))
          .count()
        println(s"SCRATCHI fanout=$n")
      }
      phase("S5v1 shuffle_hash join") {
        sh.as("a").join(sh.as("b").hint("shuffle_hash"),
            col("a.shingle") === col("b.shingle") && col("a.id") < col("b.id"))
          .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
          .agg(count(lit(1)).as("inter"),
            min(col("a.sz")).as("size_a"), min(col("b.sz")).as("size_b"))
          .withColumn("jaccard", col("inter") /
            (col("size_a") + col("size_b") - col("inter")).cast("double"))
          .filter(col("jaccard") >= 0.5).select("id_a", "id_b").count()
      }
      phase("S5v2 merge_sort join") {
        sh.as("a").join(sh.as("b").hint("merge"),
            col("a.shingle") === col("b.shingle") && col("a.id") < col("b.id"))
          .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
          .agg(count(lit(1)).as("inter"),
            min(col("a.sz")).as("size_a"), min(col("b.sz")).as("size_b"))
          .withColumn("jaccard", col("inter") /
            (col("size_a") + col("size_b") - col("inter")).cast("double"))
          .filter(col("jaccard") >= 0.5).select("id_a", "id_b").count()
      }
      phase("S5v3 sizes-join (no sz in join)") {
        val s2 = sh.select("id", "shingle")
        val sizes = sh.groupBy("id").agg(count(lit(1)).as("sz"))
        s2.as("a").join(s2.as("b"),
            col("a.shingle") === col("b.shingle") && col("a.id") < col("b.id"))
          .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
          .agg(count(lit(1)).as("inter"))
          .join(sizes.select(col("id").as("id_a"), col("sz").as("size_a")), "id_a")
          .join(sizes.select(col("id").as("id_b"), col("sz").as("size_b")), "id_b")
          .withColumn("jaccard", col("inter") /
            (col("size_a") + col("size_b") - col("inter")).cast("double"))
          .filter(col("jaccard") >= 0.5).select("id_a", "id_b").count()
      }
      val pairs = phase("S5 pairs (construct+count)") {
        val p = Dedup.jaccardPairs(st.unitDeduped, n = 3, threshold = 0.5,
          maxDocFreq = Some(100L)).select("id_a", "id_b")
        p.count(); p
      }
      val clusters = phase("S5 clusters") {
        val c = Dedup.nearDupClusters(pairs); c.count(); c
      }
      phase("S6+S7 splitAndPack") {
        CurationPipeline.splitAndPack(st.unitDeduped, clusters, "doc_id",
          2048L).count()
      }
    }
    spark.stop()
  }
}
