package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextHash

/** A RELATIONAL Bloom filter — membership in a reference set tested
  * against a FIXED-SIZE set-bit relation instead of the set itself:
  * the 100 TB decontamination shape, where shipping every eval
  * benchmark's shingle set to every executor (or joining the raw
  * corpus against it) is replaced by a ≤ `numBits`-row integer
  * relation that broadcasts for free and unions idempotently.
  *
  * Same register discipline as [[DistinctSketch]]/[[FreqSketch]]: the
  * state is an ordinary `(bit)` relation over the cross-engine
  * [[TextHash.hash60]] + [[TextHash.mixSeeded]] family — every step
  * integer-exact, so the oracle hash-compares the BITS and the
  * membership verdicts themselves. Guarantees are one-sided exactly
  * like the paper construction: `possiblyContains` is TRUE for every
  * true member (no false negatives), false positives at rate
  * ~`(1 − e^{−kn/m})^k`; a downstream fraction threshold
  * ([[contaminatedDocs]]) therefore only ever OVER-flags relative to
  * the exact join ([[Dedup.contaminationPairs]]) — flagged_exact ⊆
  * flagged_bloom, pinned in BloomSetSpec.
  *
  * Mergeability: the bit relation folds by DISTINCT UNION —
  * idempotent AND commutative, so the [[IncrementalBloom]] store needs
  * no batch-disjointness contract at all (the HLL-max story, not the
  * additive one): re-delivery, overlap, arbitrary re-ordering all
  * fold to the same relation.
  */
object BloomSet {

  /** Default bits: 2^16. At k=4 hashes, 1% false positives near
    * n ≈ m/10 ≈ 6.5k members; size the filter ~10 bits/member.
    */
  val DefaultBits = 1 << 16

  /** Default hash count. */
  val DefaultHashes = 4

  private def cells(h: org.apache.spark.sql.Column, k: Int, m: Int) = {
    val consts = TextHash.mixConstants(k)
    array((0 until k).map { i =>
      pmod(TextHash.mixSeeded(h, i, consts), lit(m.toLong)).cast("long")
    }: _*)
  }

  private def checkArgs(k: Int, m: Int): Unit = {
    require(k >= 1 && k <= 16, s"numHashes must be in [1, 16], got $k")
    require(m >= 2, s"numBits must be >= 2, got $m")
  }

  /** The set-bit relation of `valueCol`'s values: distinct `bit` longs,
    * ≤ `numBits` rows whatever the set size. Nulls contribute nothing.
    */
  def bits(df: DataFrame, valueCol: String, numBits: Int = DefaultBits,
      numHashes: Int = DefaultHashes): DataFrame = {
    checkArgs(numHashes, numBits)
    df.filter(col(valueCol).isNotNull)
      .select(explode(cells(TextHash.hash60(col(valueCol)), numHashes,
        numBits)).as("bit"))
      .distinct()
  }

  /** Membership verdict per distinct `(keyCols..., valueCol)` row of
    * `queries`: TRUE iff all `numHashes` bits of the value are set —
    * never false for a true member; occasionally true for a
    * non-member. `numBits`/`numHashes` MUST match what [[bits]] used
    * (different parameters address different cells). The bit relation
    * broadcasts (≤ numBits rows); each query row costs `numHashes`
    * join probes.
    */
  def possiblyContains(bitsRel: DataFrame, queries: DataFrame,
      keyCols: Seq[String], valueCol: String, numBits: Int = DefaultBits,
      numHashes: Int = DefaultHashes): DataFrame = {
    checkArgs(numHashes, numBits)
    // same reserved-name guard as FreqSketch/DistinctSketch (ADVICE r15):
    // the probe introduces these columns unconditionally; a user column
    // with one of them would fail as an obscure ambiguous-column error
    // deep in the join instead of here
    val reserved = Set("bit", "_set")
    require(!(keyCols :+ valueCol).exists(reserved),
      s"columns ${(keyCols :+ valueCol).mkString(",")} must not use " +
        s"reserved probe names ${reserved.mkString(",")}")
    val out = (keyCols :+ valueCol).map(col)
    queries.filter(col(valueCol).isNotNull)
      .dropDuplicates(keyCols :+ valueCol)
      .select(out :+ explode(cells(TextHash.hash60(col(valueCol)),
        numHashes, numBits)).as("bit"): _*)
      .join(broadcast(bitsRel.withColumn("_set", lit(1L))), Seq("bit"), "left")
      .groupBy(out: _*)
      // per-seed rows: two seeds landing on the SAME bit contribute two
      // identically-present rows, so the all-seeds test stays count==k
      .agg((sum(coalesce(col("_set"), lit(0L))) === numHashes)
        .as("possibly_in_set"))
  }

  /** Ingest-time decontamination against a bloomed eval set: per doc,
    * the count and fraction of its (df-capped, per-doc-distinct)
    * n-gram shingles possibly present in the eval filter, flagged when
    * `hit_frac >= minFrac` OR `n_hits >= minHits`.
    *
    * One-sidedness, stated precisely: the filter has no false
    * negatives per SHINGLE, so a doc's `n_hits` is >= its exact
    * overlap with EVERY eval prompt — any doc
    * [[Dedup.contaminationPairs]] flags with overlap `o` is flagged
    * here whenever `minHits <= o` (BloomSetSpec pins this). The
    * fraction flag alone cannot promise that: the exact checker's
    * denominator is the EVAL prompt's size, this aggregate's is the
    * TRAIN doc's — a short prompt inside a long doc dilutes below any
    * fraction threshold. Set `minHits` ~ the smallest exact-overlap
    * you must catch (0.8 x the minimum prompt shingle count), or
    * chunk long docs upstream ([[TextChunk.slidingChunks]]) so the
    * denominators align.
    */
  def contaminatedDocs(docs: DataFrame, evalBits: DataFrame, n: Int = 5,
      minFrac: Double = 0.3, minHits: Option[Long] = None,
      maxDocFreq: Option[Long] = None,
      idCol: String = "doc_id", textCol: String = "text",
      numBits: Int = DefaultBits,
      numHashes: Int = DefaultHashes): DataFrame = {
    val sh = Dedup.shingles(docs, n, idCol, textCol, maxDocFreq)
      .select(col("id").as(idCol), col("shingle"))
    val fracFlag = col("hit_frac") >= minFrac
    possiblyContains(evalBits, sh, Seq(idCol), "shingle", numBits, numHashes)
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("possibly_in_set"), 1L).otherwise(0L)).as("n_hits"))
      .withColumn("hit_frac", col("n_hits") / col("n_shingles"))
      .withColumn("flagged", minHits match {
        case Some(h) => fracFlag || col("n_hits") >= h
        case None => fracFlag
      })
  }

  /** Incremental eval-set store: bit deltas under the [[DeltaLog]]
    * layout, folded by distinct union — idempotent, so overlapping and
    * re-delivered batches are all fine (new benchmarks append as new
    * batches; the filter only ever grows).
    */
  object IncrementalBloom {

    private val mergeBits: DataFrame => DataFrame = _.distinct()

    def updateStore(storeDir: String, batchId: Long, batch: DataFrame,
        valueCol: String, numBits: Int = DefaultBits,
        numHashes: Int = DefaultHashes): Unit = {
      // pin (bits, hashes) at first write: a read with different
      // parameters addresses different cells and silently breaks the
      // no-false-negative contract — undetectable from the bit relation
      DeltaLog.pinParams(batch.sparkSession, storeDir,
        Map("numBits" -> numBits.toString, "numHashes" -> numHashes.toString))
      DeltaLog.writeDelta(bits(batch, valueCol, numBits, numHashes),
        storeDir, batchId)
    }

    def readBits(spark: SparkSession, storeDir: String): Option[DataFrame] =
      DeltaLog.readFolded(spark, storeDir, mergeBits)

    def compact(spark: SparkSession, storeDir: String): Unit =
      DeltaLog.compact(spark, storeDir, mergeBits)

    /** foreachBatch adapter: fold every micro-batch's bits. */
    def sink(storeDir: String, valueCol: String,
        numBits: Int = DefaultBits,
        numHashes: Int = DefaultHashes): (DataFrame, Long) => Unit =
      (batch, id) => updateStore(storeDir, id, batch, valueCol, numBits,
        numHashes)

    /** [[BloomSet.contaminatedDocs]] against the folded store — the
      * ingest-time read side: eval benchmarks land as bit deltas (new
      * batches as new benchmarks publish), arriving doc batches check
      * against the CURRENT filter with zero eval re-shingling. None
      * before the first benchmark lands.
      */
    def contaminatedAgainstStore(spark: SparkSession, storeDir: String,
        docs: DataFrame, n: Int = 5, minFrac: Double = 0.3,
        minHits: Option[Long] = None, maxDocFreq: Option[Long] = None,
        idCol: String = "doc_id", textCol: String = "text",
        numBits: Int = DefaultBits,
        numHashes: Int = DefaultHashes): Option[DataFrame] = {
      DeltaLog.checkParams(spark, storeDir,
        Map("numBits" -> numBits.toString, "numHashes" -> numHashes.toString))
      readBits(spark, storeDir).map(b =>
        contaminatedDocs(docs, b, n, minFrac, minHits, maxDocFreq, idCol,
          textCol, numBits, numHashes))
    }
  }
}
