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
}
