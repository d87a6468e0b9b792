package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Value normalization for feature columns — the tail-taming step
  * between raw telemetry and a trainable feature: a numeric column's
  * extreme percentiles are measurement noise (or adversarial), and a
  * model fed raw values learns the noise.
  *
  * [[winsorize]] clips to per-group percentile bounds computed with the
  * exact linear-interpolation `percentile` (the same definition as the
  * oracle's `quantile_cont`, so bounds are cross-engine identical —
  * the `value_quantiles_by_type` precedent). Two passes by
  * construction: a per-group percentile aggregate (small result, one
  * shuffle partial-combined by group) broadcast-joined back onto the
  * rows — the group-bounds table is |groups|-sized, never row-sized,
  * so the join never shuffles the fact side at any scale.
  */
object Normalize {

  /** Rows with `valueCol` clipped into its group's `[lo, hi]` percentile
    * bounds (added as `<valueCol>_w`, bounds as `_lo`/`_hi`). Null and
    * NaN values pass through unclipped (they carry their own meaning;
    * filter them upstream if unwanted).
    */
  def winsorize(df: DataFrame, valueCol: String, groupCols: Seq[String],
      lo: Double = 0.05, hi: Double = 0.95): DataFrame = {
    require(lo >= 0 && hi <= 1 && lo < hi, s"need 0 <= lo < hi <= 1, got [$lo, $hi]")
    require(groupCols.nonEmpty, "winsorize needs at least one group column")
    val clean = col(valueCol).isNotNull && !isnan(col(valueCol))
    val bounds = df.filter(clean)
      .groupBy(groupCols.map(col): _*)
      .agg(percentile(col(valueCol), lit(lo)).as("_lo"),
        percentile(col(valueCol), lit(hi)).as("_hi"))
    df.join(broadcast(bounds), groupCols, "left")
      .withColumn(s"${valueCol}_w",
        when(clean, least(greatest(col(valueCol), col("_lo")), col("_hi")))
          .otherwise(col(valueCol)))
  }

  /** Per-group percentile RANK (`percent_rank` over (tier, id) within
    * each group) without the per-group global sort: rank-normalizing a
    * quality score within each language is how per-language curation
    * thresholds are set, but `Window.partitionBy(lang).orderBy(...)`
    * funnels an entire language — half the corpus, at 100 TB — through
    * ONE task. Two-phase instead, the [[SequencePack.packOffsets]]
    * playbook at rank granularity:
    *
    *  1. count rows per (group, tier) — `tierCol` must be a bounded
    *     integer discretization (e.g. `floor(quality*1e4)`), so this
    *     relation is |groups|·|tiers| rows, corpus-independent;
    *  2. a running sum over THAT relation (windowed by group — fine,
    *     it is tiny) gives each tier's strictly-before count;
    *  3. rows rank within their (group, tier) only — max task = one
    *     tier of one group — and `rank = cum_before + within-tier
    *     row_number` reproduces the single-window rank exactly
    *     (`idCol` unique ⇒ no ties ⇒ percent_rank = (rank−1)/(n−1)).
    *
    * Returns the rows plus (`rank`, `pct`); single-row groups get
    * pct = 0 (percent_rank's convention, dodging 0/0).
    */
  def percentileRanks(df: DataFrame, groupCol: String, tierCol: String,
      idCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = df.groupBy(col(groupCol), col(tierCol))
      .agg(count(lit(1)).as("_n"))
    val wTier = Window.partitionBy(groupCol).orderBy(tierCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = counts
      .withColumn("_cum_before", coalesce(sum(col("_n")).over(wTier), lit(0L)))
      .withColumn("_n_group",
        sum(col("_n")).over(Window.partitionBy(groupCol)))
      .select(col(groupCol), col(tierCol), col("_cum_before"), col("_n_group"))
    val wIn = Window.partitionBy(groupCol, tierCol).orderBy(idCol)
    df.join(broadcast(cum), Seq(groupCol, tierCol))
      .withColumn("rank", col("_cum_before") + row_number().over(wIn))
      .withColumn("pct", when(col("_n_group") === 1L, lit(0.0))
        .otherwise((col("rank") - 1L).cast("double") /
          (col("_n_group") - 1L).cast("double")))
      .drop("_cum_before", "_n_group")
  }
}
