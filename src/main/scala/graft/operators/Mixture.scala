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

  /** WEIGHTED sampling without replacement, exactly k per group — the
    * Efraimidis–Spirakis one-pass scheme (each item ranked by
    * `u^(1/w)`, the k largest win; inclusion probabilities follow the
    * weights) with the u drawn from the CONTENT HASH instead of
    * `rand()`: `u = (hash60(id) + 1) / 2^60 ∈ (0, 1]`, so like every
    * sampler here the pick is a deterministic function of the data —
    * reproducible at any parallelism, stable across reruns,
    * oracle-replayable. Ranking uses the log form
    * `key = ln(u) / w` (monotone in u^(1/w), no pow — ln and divide
    * are the cross-engine-stable ops the LM oracles already lean on);
    * ties break by id.
    *
    * This is the missing corner of the sampling family: stratified =
    * uniform-k per group, temperature = weighted RATES with random
    * size, this = weighted EXACT-k — "give me exactly 1000 docs per
    * language, quality-weighted". One |groups|-partitioned rank window
    * over the scan; weights must be strictly positive.
    */
  def weightedSampleK(docs: DataFrame, groupCol: String, idCol: String,
      weightCol: String, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    import org.apache.spark.sql.expressions.Window
    val u = (TextHash.hash60(col(idCol).cast("string")) + 1L)
      .cast("double") / lit(1152921504606846976.0) // 2^60
    val key = log(u) / col(weightCol).cast("double")
    val w = Window.partitionBy(groupCol)
      .orderBy(col("_es_key").desc, col(idCol))
    // NaN weights must be excluded EXPLICITLY: `NaN > 0` is true under
    // Spark's ordering-style comparison, and a NaN key would sort above
    // every real key and hijack the sample
    docs.filter(col(weightCol) > 0 && !isnan(col(weightCol).cast("double")))
      .withColumn("_es_key", key)
      .withColumn("_es_rank", row_number().over(w))
      .filter(col("_es_rank") <= k)
      .drop("_es_key", "_es_rank")
  }
}
