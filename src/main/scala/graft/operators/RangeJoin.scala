package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval range join, bucketed — `p BETWEEN start AND end`
  * (inclusive both ends) with or without additional equi keys. The
  * reference has no range operator (SURVEY §2.4); this is extension
  * surface, sibling of [[AsOfJoin]].
  *
  * Why not write the predicate directly: without an equi key Spark can
  * only plan an inequality join as BroadcastNestedLoop — O(|points| *
  * |intervals|) comparisons and a broadcast-sized build side, neither of
  * which survives two large inputs. Bucketing turns it into an
  * EQUI-join: chop the number line into width-`bucketWidth` buckets;
  * an interval overlaps `(end-start)/W + 1` consecutive buckets and a
  * point lives in exactly one, so emitting one interval copy per
  * covered bucket and hash-joining on (keys..., bucket) finds every
  * containing pair; the exact BETWEEN filter then drops same-bucket
  * near-misses. Expected cost: |points| + |intervals| * (avgWidth/W + 1)
  * join rows, shuffled hash/SMJ — both sides arbitrarily large.
  *
  * Sizing `bucketWidth`: close to the TYPICAL interval width. Too small
  * → interval replication (width/W copies each); too large → bucket
  * fan-in (many non-matching points share a bucket with each interval
  * and die in the filter). Skewed widths: [[pointInIntervalTiered]] /
  * [[intervalOverlapTiered]] split the long tail into its own join at a
  * coarser W and union — widths, unlike keys, are known before the
  * shuffle (`end - start` is a per-row projection), so the split is a
  * deterministic filter, not a sampling pass.
  *
  * Semantics: inner join; NULL positions/bounds and empty intervals
  * (start > end) produce no rows, matching SQL BETWEEN. Positions are
  * NUMERIC (cast timestamps/dates to epoch seconds/days first — keeps
  * the operator agnostic to time semantics and engine-portable).
  */
object RangeJoin {

  /** @param pointPos    numeric position column in `points`.
    * @param start, end  numeric bound columns in `intervals`, inclusive.
    * @param bucketWidth bucket size in position units, > 0.
    * @param keys        extra equi-key columns present on BOTH sides.
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      pointPos: String, start: String, end: String, bucketWidth: Long,
      keys: Seq[String] = Nil): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    val clash = points.columns.toSet.intersect(intervals.columns.toSet) -- keys
    require(clash.isEmpty,
      s"non-key columns exist on both sides: ${clash.mkString(", ")} — rename before joining")

    def bucketOf(c: Column): Column = floor(c / lit(bucketWidth)).cast("long")
    val pts = points.filter(col(pointPos).isNotNull)
      .withColumn("_bkt", bucketOf(col(pointPos)))
    val ivals = intervals
      .filter(col(start).isNotNull && col(end).isNotNull &&
        col(start) <= col(end))
      .withColumn("_bkt",
        explode(sequence(bucketOf(col(start)), bucketOf(col(end)))))
    pts.join(ivals, keys :+ "_bkt")
      .filter(col(pointPos) >= col(start) && col(pointPos) <= col(end))
      .drop("_bkt")
  }

  /** Interval-overlap join: pairs whose CLOSED intervals intersect
    * (`lStart <= rEnd AND rStart <= lEnd`), bucketed the same way. Both
    * sides explode to their covered buckets; overlapping intervals share
    * every bucket in `[max(startBuckets), min(endBuckets)]`, so to emit
    * each pair EXACTLY once (multiset-safe — no distinct, duplicate
    * input rows survive) the join keeps only the FIRST shared bucket:
    * `_bkt = max(bucket(lStart), bucket(rStart))`. Cost:
    * sum of (width/W + 1) copies per row — same sizing rule as
    * [[pointInInterval]], with W near the typical width of the WIDER
    * side.
    */
  def intervalOverlap(left: DataFrame, right: DataFrame,
      lStart: String, lEnd: String, rStart: String, rEnd: String,
      bucketWidth: Long, keys: Seq[String] = Nil): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    val clash = left.columns.toSet.intersect(right.columns.toSet) -- keys
    require(clash.isEmpty,
      s"non-key columns exist on both sides: ${clash.mkString(", ")} — rename before joining")

    def bucketOf(c: Column): Column = floor(c / lit(bucketWidth)).cast("long")
    def exploded(df: DataFrame, s: String, e: String): DataFrame = df
      .filter(col(s).isNotNull && col(e).isNotNull && col(s) <= col(e))
      .withColumn("_bkt", explode(sequence(bucketOf(col(s)), bucketOf(col(e)))))
    exploded(left, lStart, lEnd)
      .join(exploded(right, rStart, rEnd), keys :+ "_bkt")
      .filter(col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd) &&
        col("_bkt") === greatest(bucketOf(col(lStart)), bucketOf(col(rStart))))
      .drop("_bkt")
  }

  /** [[pointInInterval]] with automatic WIDTH-skew handling: intervals
    * wider than `tailWidth` route through their own join at the coarser
    * `tailBucketWidth`, and the two joins union. At 100 TB a heavy-tailed
    * width distribution (one year-long interval among minutes) otherwise
    * replicates `width/W` copies of every tail row — a single
    * minute-sized W turns one year interval into ~500k join rows; the
    * coarse tier caps that at `width/tailBucketWidth`.
    *
    * Correctness is free: the two interval subsets are DISJOINT
    * (`width <= tailWidth` vs `>`; null/empty intervals match neither
    * and produce no rows in either tier, as before), each tier is an
    * exact [[pointInInterval]], and the union is therefore multiset-safe
    * — no dedup needed. Cost: the points side is scanned by both tiers
    * (two shuffles of points instead of one); worth it exactly when the
    * tail's replication factor dominates, i.e. when
    * `tailFrac * avgTailWidth / bucketWidth` join rows would exceed
    * `|points|`. Sizing: `bucketWidth` near the TYPICAL width as before;
    * `tailWidth` at the knee of the width distribution (e.g. p99);
    * `tailBucketWidth` near the typical TAIL width.
    */
  def pointInIntervalTiered(points: DataFrame, intervals: DataFrame,
      pointPos: String, start: String, end: String,
      bucketWidth: Long, tailWidth: Long, tailBucketWidth: Long,
      keys: Seq[String] = Nil): DataFrame = {
    require(tailWidth > 0, s"tailWidth must be positive: $tailWidth")
    require(tailBucketWidth > bucketWidth,
      s"tailBucketWidth ($tailBucketWidth) must be coarser than bucketWidth ($bucketWidth)")
    val w = col(end) - col(start)
    pointInInterval(points, intervals.filter(w <= lit(tailWidth)),
        pointPos, start, end, bucketWidth, keys)
      .unionByName(pointInInterval(points, intervals.filter(w > lit(tailWidth)),
        pointPos, start, end, tailBucketWidth, keys))
  }

  /** [[intervalOverlap]] with the same automatic width-skew split on
    * BOTH sides: each side partitions into narrow (`width <= tailWidth`)
    * and tail (`width > tailWidth`), and the four disjoint cross-products
    * union — narrow×narrow at `bucketWidth`, every pairing that touches
    * a tail row at `tailBucketWidth` (the wider side dictates the
    * replication, so any tail participant wants the coarse W). Disjoint
    * input subsets → each pair is emitted by exactly one tier → the
    * union stays multiset-safe without `distinct`. Cost: each side is
    * scanned twice and the narrow sides shuffle twice; the win is the
    * same replication cap as [[pointInIntervalTiered]].
    */
  def intervalOverlapTiered(left: DataFrame, right: DataFrame,
      lStart: String, lEnd: String, rStart: String, rEnd: String,
      bucketWidth: Long, tailWidth: Long, tailBucketWidth: Long,
      keys: Seq[String] = Nil): DataFrame = {
    require(tailWidth > 0, s"tailWidth must be positive: $tailWidth")
    require(tailBucketWidth > bucketWidth,
      s"tailBucketWidth ($tailBucketWidth) must be coarser than bucketWidth ($bucketWidth)")
    val lw = col(lEnd) - col(lStart)
    val rw = col(rEnd) - col(rStart)
    val (ln, lt) = (left.filter(lw <= lit(tailWidth)), left.filter(lw > lit(tailWidth)))
    val (rn, rt) = (right.filter(rw <= lit(tailWidth)), right.filter(rw > lit(tailWidth)))
    def ov(l: DataFrame, r: DataFrame, width: Long) =
      intervalOverlap(l, r, lStart, lEnd, rStart, rEnd, width, keys)
    ov(ln, rn, bucketWidth)
      .unionByName(ov(ln, rt, tailBucketWidth))
      .unionByName(ov(lt, rn, tailBucketWidth))
      .unionByName(ov(lt, rt, tailBucketWidth))
  }
}
