package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextHash

/** A from-scratch RELATIONAL Count-Min sketch — the FREQUENCY sibling
  * of [[DistinctSketch]]'s relational HLL: approximate per-value counts
  * (heavy hitters, token frequencies, hot keys) in fixed space, with
  * the register state an ordinary `(group..., r, c, cnt)` relation —
  * every step integer-exact and oracle-replayable, so the driver
  * hash-compares the REGISTERS and the ESTIMATES themselves rather
  * than bounds-checking an engine-private binary sketch.
  *
  * Construction (classic CMS over the cross-engine
  * [[TextHash.hash60]] + the [[TextHash.mixSeeded]] affine family the
  * minhash signatures already use): a value hashes once, each of
  * `depth` seeded mixes picks a column in `[0, width)`, and the
  * register `(r, c)` counts OCCURRENCES landing there. The estimate
  * for a value is the MIN over its `depth` cells — an overestimate
  * only (collisions only ever add), within `2·N/width` of truth with
  * probability `1 − 2^−depth`.
  *
  * Mergeability: registers are ADDITIVE (`sum` per cell), so per-batch
  * register deltas fold under the [[DeltaLog]] layout exactly like the
  * boilerplate df store — fold == one-shot for DISJOINT batches, with
  * re-delivery idempotent via the per-batch-dir Overwrite (the same
  * contract, unlike the HLL max which needs nothing). Store size:
  * ≤ `depth·width` rows per group, forever, whatever the corpus.
  *
  * Scale shape: one scan, an in-row explode (×depth), one
  * partial+final sum aggregate on `(group, r, c)` — map-side combine
  * collapses every partition to ≤ |groups|·depth·width rows before the
  * exchange, so the shuffle never carries data-proportional volume.
  * Estimation joins the ≤ |groups|·depth·width-row register relation
  * (broadcast) against the query set's `depth` cells per value.
  */
object FreqSketch {

  /** Default depth: 4 seeded hash rows — error probability 1/16. */
  val DefaultDepth = 4

  /** Default width: 256 columns — additive error ≤ 2·N/256 w.p. 15/16. */
  val DefaultWidth = 256

  private def cells(h: org.apache.spark.sql.Column, depth: Int, width: Int) = {
    val consts = TextHash.mixConstants(depth)
    array((0 until depth).map { i =>
      struct(lit(i).cast("int").as("r"),
        pmod(TextHash.mixSeeded(h, i, consts), lit(width.toLong))
          .cast("long").as("c"))
    }: _*)
  }

  private def checkArgs(groupCols: Seq[String], depth: Int,
      width: Int): Unit = {
    require(depth >= 1 && depth <= 16, s"depth must be in [1, 16], got $depth")
    require(width >= 2, s"width must be >= 2, got $width")
    val reserved = Set("r", "c", "cnt", "_h", "_rc")
    require(!groupCols.exists(reserved),
      s"groupCols ${groupCols.mkString(",")} must not use reserved " +
        s"register-relation names ${reserved.mkString(",")}")
  }

  /** The `(group..., r, c, cnt)` register relation counting occurrences
    * of `valueCol` within each group. Null values contribute nothing.
    */
  def registers(df: DataFrame, groupCols: Seq[String], valueCol: String,
      depth: Int = DefaultDepth, width: Int = DefaultWidth): DataFrame = {
    checkArgs(groupCols, depth, width)
    df.filter(col(valueCol).isNotNull)
      .select(groupCols.map(col) :+
        TextHash.hash60(col(valueCol)).as("_h"): _*)
      .select(groupCols.map(col) :+
        explode(cells(col("_h"), depth, width)).as("_rc"): _*)
      .select(groupCols.map(col) :+ col("_rc.r").as("r") :+
        col("_rc.c").as("c"): _*)
      .groupBy(groupCols.map(col) :+ col("r") :+ col("c"): _*)
      .agg(count(lit(1)).as("cnt"))
  }

  /** The CMS estimate for every row of `queries` (which must carry
    * `groupCols` and `valueCol`): min over the value's `depth` cells,
    * 0 for a value whose cells are all empty. `depth`/`width` MUST
    * match what [[registers]] used — a mismatch changes the cell
    * addresses and silently misestimates, so the register relation is
    * validated on the broadcast side BOTH ways (ADVICE r15: the
    * range-only check passed a LARGER estimate-side depth/width and
    * silently returned cms_count 0 for seen values, violating the
    * only-ever-OVERCOUNT contract):
    *   - range: no register may sit at r ≥ depth or c ≥ width (catches
    *     a smaller estimate-side parameter);
    *   - cardinality: a non-empty register relation built with depth d'
    *     has EXACTLY d' distinct r values (every value lands once in
    *     every row), so countDistinct(r) ≠ depth catches a depth
    *     mismatch in EITHER direction deterministically.
    * A larger estimate-side WIDTH alone is not detectable from the
    * relation (all addresses in range, all rows present) — that is what
    * the [[IncrementalFreq]] store's `_PARAMS` pin is for; raw-relational
    * callers own the width contract.
    * Estimates only ever OVERCOUNT (collisions add).
    */
  def estimate(regs: DataFrame, queries: DataFrame, groupCols: Seq[String],
      valueCol: String, depth: Int = DefaultDepth,
      width: Int = DefaultWidth): DataFrame = {
    checkArgs(groupCols, depth, width)
    val rCard = regs.agg(countDistinct(col("r")).as("_rcard"))
    val guarded = regs
      // 1-row scalar broadcast, the usual pattern for whole-relation guards
      .crossJoin(broadcast(rCard))
      .withColumn("r", when(col("_rcard") =!= depth,
        raise_error(concat(lit("FreqSketch.estimate: registers carry "),
          col("_rcard"),
          lit(s" distinct hash rows but estimate() was called with " +
            s"depth=$depth — registers() used a different depth"))))
        .otherwise(col("r")))
      .drop("_rcard")
      .withColumn("r", when(col("r") >= depth || col("c") >= width,
        raise_error(concat(lit(s"FreqSketch.estimate: register (r,c)=("),
          col("r"), lit(","), col("c"),
          lit(s") outside depth=$depth width=$width — estimate() called " +
            "with different parameters than registers()"))))
        .otherwise(col("r")))
    val q = queries.filter(col(valueCol).isNotNull)
      .select((groupCols.map(col) :+ col(valueCol) :+
        TextHash.hash60(col(valueCol)).as("_h")): _*)
      .select((groupCols.map(col) :+ col(valueCol) :+
        explode(cells(col("_h"), depth, width)).as("_rc")): _*)
      .select((groupCols.map(col) :+ col(valueCol) :+
        col("_rc.r").as("r") :+ col("_rc.c").as("c")): _*)
    q.join(broadcast(guarded), groupCols ++ Seq("r", "c"), "left")
      .groupBy((groupCols :+ valueCol).map(col): _*)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cms_count"))
  }

  /** Incremental frequency store: register deltas under the
    * [[DeltaLog]] layout, merged by the additive per-cell sum
    * (disjoint-batch contract, re-delivery idempotent per batch dir).
    */
  object IncrementalFreq {

    private def mergeRegs(groupCols: Seq[String]): DataFrame => DataFrame =
      _.groupBy((groupCols ++ Seq("r", "c")).map(col): _*)
        .agg(sum(col("cnt")).as("cnt"))

    def updateStore(storeDir: String, batchId: Long, batch: DataFrame,
        groupCols: Seq[String], valueCol: String,
        depth: Int = DefaultDepth, width: Int = DefaultWidth): Unit = {
      // pin (depth, width) at first write: width mismatches are not
      // detectable from the register relation alone (ADVICE r15)
      DeltaLog.pinParams(batch.sparkSession, storeDir,
        Map("depth" -> depth.toString, "width" -> width.toString))
      DeltaLog.writeDelta(registers(batch, groupCols, valueCol, depth, width),
        storeDir, batchId)
    }

    /** The folded register relation — equal to a one-shot [[registers]]
      * over everything ingested (disjoint batches).
      */
    def readRegisters(spark: SparkSession, storeDir: String,
        groupCols: Seq[String]): Option[DataFrame] =
      DeltaLog.readFolded(spark, storeDir, mergeRegs(groupCols))

    def readEstimate(spark: SparkSession, storeDir: String,
        queries: DataFrame, groupCols: Seq[String], valueCol: String,
        depth: Int = DefaultDepth,
        width: Int = DefaultWidth): Option[DataFrame] = {
      DeltaLog.checkParams(spark, storeDir,
        Map("depth" -> depth.toString, "width" -> width.toString))
      readRegisters(spark, storeDir, groupCols)
        .map(estimate(_, queries, groupCols, valueCol, depth, width))
    }

    def compact(spark: SparkSession, storeDir: String,
        groupCols: Seq[String]): Unit =
      DeltaLog.compact(spark, storeDir, mergeRegs(groupCols))

    /** foreachBatch adapter: fold every micro-batch's registers. */
    def sink(storeDir: String, groupCols: Seq[String], valueCol: String,
        depth: Int = DefaultDepth,
        width: Int = DefaultWidth): (DataFrame, Long) => Unit =
      (batch, id) => updateStore(storeDir, id, batch, groupCols, valueCol,
        depth, width)
  }
}
