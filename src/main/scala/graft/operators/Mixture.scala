package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextHash

/** Temperature-flattened mixture sampling — re-balance a multi-source
  * (or multi-language) corpus so small slices are not drowned out: keep
  * documents at a per-group rate chosen so EXPECTED sample counts
  * follow n^α instead of n (the unigram-LM / multilingual "temperature"
  * resampling of the mBERT/XLM-R lineage). α is fixed at 0.5 — the
  * flattening is `scalePpm / sqrt(n_g)` — because sqrt is
  * IEEE-correctly-rounded in every engine (Java `Math.sqrt`, C
  * `sqrt`), which makes the whole rate computation bit-reproducible
  * cross-engine; a general `pow(n, α)` carries no such guarantee.
  *
  * Selection is by CONTENT HASH against the rate (keep iff
  * `hash60(text) % 1e6 < keep_ppm`), not `rand()`: the sample is a
  * deterministic function of the data, reproducible at any
  * parallelism, stable across reruns, and — because the hash ignores
  * the grouping column — a document's fate never changes just because
  * its group was re-labeled.
  *
  * Shape: one count aggregate (|groups| rows), rates derived on the
  * |groups|-row table, broadcast back; the corpus side is one scan +
  * one codegen'd filter. Expected count from group g:
  * `n_g · keep_ppm_g / 1e6 = scalePpm · sqrt(n_g) / 1e6  ∝  √n_g`.
  */
object Mixture {

  /** Kept documents with their group's `keep_ppm` (parts-per-million
    * keep rate, capped at 1e6). `scalePpm` scales overall sample size:
    * expected total ≈ `scalePpm · Σ_g sqrt(n_g) / 1e6`.
    */
  def temperatureSample(docs: DataFrame, groupCol: String, textCol: String,
      scalePpm: Long): DataFrame = {
    require(scalePpm > 0, s"scalePpm must be positive, got $scalePpm")
    val rates = docs.groupBy(col(groupCol)).agg(count(lit(1)).as("n"))
      .select(col(groupCol),
        least(lit(1000000L),
          floor(lit(scalePpm) / sqrt(col("n").cast("double"))).cast("long"))
          .as("keep_ppm"))
    docs.join(broadcast(rates), groupCol)
      .filter(TextHash.hash60(col(textCol)) % 1000000L < col("keep_ppm"))
  }
}
