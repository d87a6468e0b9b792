package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Incremental column statistics — the metadata twin of
  * [[IncrementalDedup]]: per-batch MERGEABLE summaries that fold into a
  * persisted store, so corpus-level statistics (row counts, null
  * counts, bounds, distinct cardinality) stay current under continuous
  * ingestion WITHOUT ever re-scanning the corpus. A nightly
  * [[Profile.profile]] over 100 TB is a full-corpus scan for an
  * O(batch)-sized question; here each batch is scanned exactly once, and
  * the store is |columns| rows forever.
  *
  * Everything in a summary row is a commutative monoid:
  *   - counts merge by sum;
  *   - bounds merge by min/max IN THE COLUMN'S OWN ORDER — three typed
  *     families (long / double / string), exactly one populated per
  *     column, so merging never compares numbers lexicographically and
  *     never round-trips integers through doubles;
  *   - distinct cardinality merges by HLL sketch union (Apache
  *     DataSketches via hll_sketch_agg / hll_union_agg — the union of
  *     sketches IS the sketch of the union, so batch-wise folding loses
  *     nothing vs a one-shot sketch).
  *
  * Exact distinct counts are NOT incrementally mergeable (that is the
  * point of the sketch); [[report]] surfaces the HLL estimate, whose
  * default lgK=12 config carries ~1.6% rsd — the oracle bounds it the
  * same way as `approx_distinct_users_daily`.
  */
object IncrementalProfile {

  /** One mergeable summary row per column of `cols`:
    * (col_name, n_non_null, n_nulls, min/max in the column's typed
    * family, distinct_hll binary sketch). One scan for all columns.
    */
  def summarize(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "summarize needs at least one column")
    def family(c: String): String = df.schema(c).dataType match {
      case LongType | IntegerType | ShortType | ByteType => "long"
      case DoubleType | FloatType | _: DecimalType       => "double"
      case _                                             => "string"
    }
    val aggs = cols.flatMap { c =>
      val fam = family(c)
      Seq(
        count(col(c)).as(s"${c}__nn"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
        (if (fam == "long") min(col(c)).cast("long") else lit(null).cast("long"))
          .as(s"${c}__minl"),
        (if (fam == "long") max(col(c)).cast("long") else lit(null).cast("long"))
          .as(s"${c}__maxl"),
        (if (fam == "double") min(col(c)).cast("double") else lit(null).cast("double"))
          .as(s"${c}__mind"),
        (if (fam == "double") max(col(c)).cast("double") else lit(null).cast("double"))
          .as(s"${c}__maxd"),
        (if (fam == "string") min(col(c)).cast("string") else lit(null).cast("string"))
          .as(s"${c}__mins"),
        (if (fam == "string") max(col(c)).cast("string") else lit(null).cast("string"))
          .as(s"${c}__maxs"),
        // sketch input must be int/bigint/string/binary: longs go in as
        // bigint; doubles (and anything else) via their canonical string
        // form — a 1:1 value encoding, so distinct counts are unchanged
        hll_sketch_agg(
          if (fam == "long") col(c).cast("long") else col(c).cast("string"))
          .as(s"${c}__hll"))
    }
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(cols.map { c =>
        struct(lit(c).as("col_name"),
          col(s"${c}__nn").as("n_non_null"),
          col(s"${c}__nulls").as("n_nulls"),
          col(s"${c}__minl").as("min_long"), col(s"${c}__maxl").as("max_long"),
          col(s"${c}__mind").as("min_dbl"), col(s"${c}__maxd").as("max_dbl"),
          col(s"${c}__mins").as("min_str"), col(s"${c}__maxs").as("max_str"),
          col(s"${c}__hll").as("distinct_hll"))
      }: _*)).as("p"))
      .select("p.*")
  }

  /** Folds two summary relations: |columns|-sized shuffle, nothing
    * corpus-sized anywhere. Aggregates skip the unpopulated families'
    * nulls, so each column's bounds merge in its own order.
    */
  def merge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("col_name").agg(
      sum("n_non_null").as("n_non_null"),
      sum("n_nulls").as("n_nulls"),
      min("min_long").as("min_long"), max("max_long").as("max_long"),
      min("min_dbl").as("min_dbl"), max("max_dbl").as("max_dbl"),
      min("min_str").as("min_str"), max("max_str").as("max_str"),
      hll_union_agg(col("distinct_hll")).as("distinct_hll"))

  /** Consumable stats from a summary: bounds rendered from whichever
    * family is populated (longs print as integers — no double
    * round-trip), distinct as the HLL estimate.
    */
  def report(summary: DataFrame): DataFrame =
    summary.select(col("col_name"), col("n_non_null"), col("n_nulls"),
      hll_sketch_estimate(col("distinct_hll")).as("n_distinct_approx"),
      coalesce(col("min_str"), col("min_long").cast("string"),
        col("min_dbl").cast("string")).as("min_value"),
      coalesce(col("max_str"), col("max_long").cast("string"),
        col("max_dbl").cast("string")).as("max_value"))

  /** Persisted fold with AT-LEAST-ONCE safety. Counts are NOT
    * idempotent under re-merge (merging the same batch twice double
    * counts), so the store records ingested batch ids as marker dirs and
    * re-delivery becomes a no-op — the same discipline as
    * [[KeyedUpsertSink]]'s idempotent overwrite, adapted to a fold.
    * Each update writes the full merged summary (it is |columns| rows)
    * under `summary/batch=<id>`; the current state is the max-id
    * snapshot, so a torn write of batch k leaves k-1 intact.
    *
    * The merge base is the newest snapshot with id STRICTLY BELOW
    * `batchId` — never the global max. A prior attempt of this very
    * batch can crash after the parquet `_SUCCESS` commit but before the
    * marker mkdirs; the global max would then be batchId's own snapshot,
    * and the re-delivered batch would double-merge its counts (and the
    * lazy merged plan would read `summary/batch=<id>` while overwriting
    * that same path). Bounding the read keeps re-delivery a no-op in
    * every crash ordering.
    */
  def updateStore(storeDir: String, batchId: Long, batch: DataFrame): Unit = {
    val spark = batch.sparkSession
    // Hadoop FileSystem, not java.nio: the store must work on HDFS/S3
    // paths, same discipline as StreamingProfile.previousSnapshot
    val marker = new Path(s"$storeDir/ingested/batch=$batchId")
    val fs = marker.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(marker)) return
    val merged = readStore(spark, storeDir, maxExclusive = Some(batchId)) match {
      case Some(cur) => merge(cur, batch)
      case None      => batch
    }
    merged.coalesce(1).write.mode("overwrite")
      .parquet(s"$storeDir/summary/batch=$batchId")
    fs.mkdirs(marker)
  }

  /** Latest COMMITTED summary (by batch id, `_SUCCESS`-gated so a
    * half-written snapshot never reads), if any batch has been ingested.
    * `maxExclusive` bounds the candidate ids (used by [[updateStore]] to
    * exclude a crashed prior attempt's own snapshot).
    */
  def readStore(spark: SparkSession, storeDir: String,
      maxExclusive: Option[Long] = None): Option[DataFrame] = {
    val base = new Path(s"$storeDir/summary")
    val fs = base.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(base)) return None
    val ids = fs.listStatus(base).toSeq
      .filter(_.isDirectory)
      .flatMap(st => st.getPath.getName.stripPrefix("batch=").toLongOption
        .filter(_ => st.getPath.getName.startsWith("batch="))
        .filter(_ => fs.exists(new Path(st.getPath, "_SUCCESS"))))
      .filter(id => maxExclusive.forall(id < _))
    if (ids.isEmpty) None
    else Some(spark.read.parquet(s"$storeDir/summary/batch=${ids.max}"))
  }

  /** foreachBatch adapter: fold every micro-batch of a stream into the
    * store — the live twin, same at-least-once marker discipline.
    */
  def sink(storeDir: String, cols: Seq[String])
      : (DataFrame, Long) => Unit = { (batch, id) =>
    updateStore(storeDir, id, summarize(batch, cols))
  }

  /** QUANTILES under continuous ingestion: the [[updateStore]]
    * discipline applied to [[Profile.hdrBins]] summaries. Because the
    * HDR fold is EXACT (bucketing is per-value-local, counts sum), the
    * persisted store always equals the one-shot summary of everything
    * ingested — so `Profile.hdrQuantiles(readQuantileStore(...))`
    * answers p50/p99-style questions over the full corpus at any moment
    * without a corpus scan, something a stored exact-quantile result
    * can never do (it cannot merge). Store is |groups|*|buckets| rows;
    * same strictly-below-batchId merge base, `_SUCCESS` gate, and
    * marker idempotence as the column-stats store.
    */
  def updateQuantileStore(storeDir: String, batchId: Long,
      batchBins: DataFrame): Unit = {
    val spark = batchBins.sparkSession
    val marker = new Path(s"$storeDir/ingested/batch=$batchId")
    val fs = marker.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(marker)) return
    val merged = readQuantileStore(spark, storeDir,
        maxExclusive = Some(batchId)) match {
      case Some(cur) => Profile.hdrMerge(cur, batchBins)
      case None      => batchBins
    }
    merged.coalesce(1).write.mode("overwrite")
      .parquet(s"$storeDir/summary/batch=$batchId")
    fs.mkdirs(marker)
  }

  /** Latest committed quantile summary `(g, bin_id, n)`, if any. */
  def readQuantileStore(spark: SparkSession, storeDir: String,
      maxExclusive: Option[Long] = None): Option[DataFrame] =
    readStore(spark, storeDir, maxExclusive)

  /** foreachBatch adapter for the quantile store. */
  def quantileSink(storeDir: String, groupCol: String, valueCol: String)
      : (DataFrame, Long) => Unit = { (batch, id) =>
    updateQuantileStore(storeDir, id, Profile.hdrBins(batch, groupCol, valueCol))
  }
}
