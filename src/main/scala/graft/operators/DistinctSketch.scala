package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextHash

/** A from-scratch RELATIONAL HyperLogLog whose register state is an
  * ordinary (group, bucket, r) relation — every step integer-exact and
  * oracle-replayable, which neither `approx_count_distinct` nor the
  * DataSketches HLL in [[IncrementalProfile]] can offer (their binary
  * sketch states are engine-private, so the oracle can only
  * bounds-check the ESTIMATE; here the driver hash-compares the
  * REGISTERS themselves).
  *
  * Construction (classic HLL over the cross-engine
  * [[TextHash.hash60]]): a value's 60-bit hash splits into a `p`-bit
  * bucket index and a (60−p)-bit tail; the register is the max over
  * the bucket's values of the tail's leading-zero rank, computed with
  * INTEGER ops only — `rank = (60−p+1) − length(bin(tail))`, with the
  * all-zeros tail pinned at 60−p+1. `bin()` exists in both engines, so
  * the whole register relation is bit-reproducible.
  *
  * The register relation is the MOST mergeable state in the codebase:
  * `max` is commutative, associative, AND idempotent, so the
  * [[IncrementalDistinct]] fold equals a one-shot build even under
  * OVERLAPPING batches and arbitrary re-delivery — a strictly stronger
  * exactness contract than the additive stores (boilerplate df needs
  * disjoint batches; this needs nothing). Store size: ≤ 2^p rows per
  * group, forever, whatever the corpus size — the whole point of a
  * sketch at 100 TB.
  *
  * Scale shape: one scan, one partial+final max aggregate on
  * (group, bucket) — map-side combine collapses each partition to
  * ≤ |groups|·2^p rows before the exchange, so the shuffle never
  * carries data-proportional volume.
  */
object DistinctSketch {

  /** Default precision: 2^8 = 256 registers, rsd ≈ 1.04/√256 ≈ 6.5%. */
  val DefaultP = 8

  /** The (group..., bucket, r) register relation for distinct values of
    * `valueCol` within each group.
    */
  def registers(df: DataFrame, groupCols: Seq[String], valueCol: String,
      p: Int = DefaultP): DataFrame = {
    require(p >= 4 && p <= 16, s"p must be in [4, 16], got $p")
    // the output introduces these names unconditionally; a group column
    // with one of them would collide or be silently shadowed (ADVICE r14)
    val reserved = Set("bucket", "r", "_tail")
    require(!groupCols.exists(reserved),
      s"groupCols ${groupCols.mkString(",")} must not use reserved " +
        s"register-relation names ${reserved.mkString(",")}")
    val m = 1L << p
    val w = 60 - p
    val h = TextHash.hash60(col(valueCol))
    val bucket = pmod(h, lit(m))
    // integer shift, not a double divide: h has 60 significant bits and
    // a double mantissa 52 — h/256.0 would corrupt the tail's low bits
    val tail = shiftright(h, p)
    val r = when(col("_tail") === 0L, lit(w + 1))
      .otherwise(lit(w + 1) - length(bin(col("_tail"))))
    df.filter(col(valueCol).isNotNull)
      .select((groupCols.map(col) :+ bucket.as("bucket") :+
        tail.as("_tail")): _*)
      .withColumn("r", r)
      .groupBy(groupCols.map(col) :+ col("bucket"): _*)
      .agg(max(col("r")).cast("int").as("r"))
  }

  /** The HLL estimate per group from a register relation:
    * `α·m² / (V + Σ 2^(−r))` with the small-range linear-counting
    * correction (`m·ln(m/V)` when the raw estimate ≤ 2.5m and empty
    * buckets remain). The harmonic sum is kept INTEGER-EXACT: a naive
    * `sum(2^−r)` of doubles rounds once partial sums pass 53 mantissa
    * bits, and partial-aggregation order would then leak into the
    * estimate (engine- and parallelism-dependent). Scaling by
    * 2^(w+1) turns every term into `1 << (w+1−r)` — a BIGINT sum that
    * is exact at any order (≤ 2^p · 2^w = 2^60) — and the single
    * BIGINT→DOUBLE cast at the end is IEEE round-to-nearest in every
    * engine. No 32-bit large-range correction: the hash space is
    * 60-bit, collisions are negligible below ~2^30 distincts.
    */
  def estimate(regs: DataFrame, groupCols: Seq[String],
      p: Int = DefaultP): DataFrame = {
    val mL = 1L << p
    val m = mL.toDouble
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    val scaleBits = 60 - p + 1 // w + 1, the max register rank
    regs
      .groupBy(groupCols.map(col): _*)
      .agg(sum(expr(s"shiftleft(CAST(1 AS BIGINT), $scaleBits - r)"))
          .as("_hsum"),
        count(lit(1)).as("_nz"))
      // p-consistency guard (ADVICE r14): nothing ties the caller's p to
      // the p registers() was built with, and a smaller p here would give
      // negative _v and NaN/garbage estimates silently. More non-empty
      // buckets than 2^p is impossible under a consistent p — fail loudly.
      .withColumn("_nz", when(col("_nz") > lit(mL),
        raise_error(concat(
          lit(s"DistinctSketch.estimate: p=$p allows $mL buckets but a " +
            "group has "), col("_nz"),
          lit(" non-empty registers — estimate() called with a smaller " +
            "p than registers() used"))))
        .otherwise(col("_nz")))
      .withColumn("_v", (lit(mL) - col("_nz")).cast("long"))
      .withColumn("_denom",
        (col("_v") * lit(1L << scaleBits) + col("_hsum")).cast("double"))
      .withColumn("_raw",
        lit(alpha * m * m * (1L << scaleBits).toDouble) / col("_denom"))
      .withColumn("approx_distinct",
        when(col("_raw") <= lit(2.5 * m) && col("_v") > 0,
          lit(m) * log(lit(m) / col("_v")))
          .otherwise(col("_raw")))
      .drop("_hsum", "_nz", "_v", "_denom", "_raw")
  }

  /** Incremental distinct-cardinality store: registers under the
    * [[DeltaLog]] layout, merged by idempotent per-bucket max.
    */
  object IncrementalDistinct {

    private def mergeRegs(groupCols: Seq[String]): DataFrame => DataFrame =
      _.groupBy(groupCols.map(col) :+ col("bucket"): _*)
        .agg(max(col("r")).cast("int").as("r"))

    def updateStore(storeDir: String, batchId: Long, batch: DataFrame,
        groupCols: Seq[String], valueCol: String,
        p: Int = DefaultP): Unit = {
      // pin p at first write: the in-relation _nz guard catches a
      // SMALLER estimate-side p, but a LARGER one passes it and silently
      // underestimates — only metadata can catch that direction
      // (ADVICE r15, the FreqSketch asymmetry's HLL twin)
      DeltaLog.pinParams(batch.sparkSession, storeDir, Map("p" -> p.toString))
      DeltaLog.writeDelta(registers(batch, groupCols, valueCol, p),
        storeDir, batchId)
    }

    /** The folded register relation as of the last committed batch —
      * equal to a one-shot [[registers]] over everything ingested.
      */
    def readRegisters(spark: SparkSession, storeDir: String,
        groupCols: Seq[String]): Option[DataFrame] =
      DeltaLog.readFolded(spark, storeDir, mergeRegs(groupCols))

    def readEstimate(spark: SparkSession, storeDir: String,
        groupCols: Seq[String], p: Int = DefaultP): Option[DataFrame] = {
      DeltaLog.checkParams(spark, storeDir, Map("p" -> p.toString))
      readRegisters(spark, storeDir, groupCols)
        .map(estimate(_, groupCols, p))
    }

    def compact(spark: SparkSession, storeDir: String,
        groupCols: Seq[String]): Unit =
      DeltaLog.compact(spark, storeDir, mergeRegs(groupCols))

    /** foreachBatch adapter: fold every micro-batch's registers. */
    def sink(storeDir: String, groupCols: Seq[String], valueCol: String,
        p: Int = DefaultP): (DataFrame, Long) => Unit =
      (batch, id) => updateStore(storeDir, id, batch, groupCols, valueCol, p)
  }

  /** The DuckDB side of [[registers]] for oracle builders: the same
    * bucket/tail/rank arithmetic over the same md5-hex hash.
    */
  def registersSqlExprs(valueExpr: String, p: Int = DefaultP)
      : (String, String) = {
    val m = 1L << p
    val w = 60 - p
    val h = s"('0x'||substr(md5(($valueExpr)::VARCHAR),1,15))::BIGINT"
    val bucket = s"($h % $m)"
    val tail = s"($h // $m)"
    val r = s"(CASE WHEN $tail = 0 THEN ${w + 1} " +
      s"ELSE ${w + 1} - length(bin($tail)) END)"
    (bucket, r)
  }
}
