package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** BM25 relevance scoring of a corpus against a fixed term set — the
  * retrieval primitive behind relevance-based corpus curation (keep
  * documents on-topic for a target domain, rank crawl output against a
  * seed query). The reference has no text scoring at all; this extends
  * the text-analysis family ([[graft.functions.TextAnalysis]]).
  *
  * Shape: inverted-index style, all relational —
  * tokenize once → explode → filter to the |terms| query terms (the
  * explode output shrinks to matched tokens immediately) → tf per
  * (doc, term) and df per term as hash aggregates → one broadcast of
  * the |terms|-row df table and of the 1-row corpus stats → per-doc
  * score sum. Cost: one pass over tokens plus hash aggregates keyed by
  * doc — no pairwise anything; 100 TB-safe by construction.
  *
  * Determinism: idf = ln((N - df + 0.5)/(df + 0.5) + 1) (the
  * Robertson-Sparck-Jones formulation with the +1 floor keeping it
  * positive); ln agrees bit-for-bit across engines on these inputs and
  * the per-doc sum spans at most |terms| addends, so a 1e-4 floor
  * truncation is comparison-stable (unlike large-group float sums,
  * SURVEY §7.3).
  */
object Relevance {

  /** Scores = sum over matched terms of
    * `idf(t) * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))`.
    * Documents matching NO query term are omitted (their score is 0);
    * null texts are dropped. Tokenization: lowercase, whitespace split
    * (mirrors the token-counting convention).
    */
  def bm25(docs: DataFrame, terms: Seq[String], k1: Double = 1.2,
      b: Double = 0.75, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(terms.nonEmpty, "bm25 needs at least one query term")
    val toks = docs.filter(col(textCol).isNotNull)
      .select(col(idCol).as("id"),
        split(trim(lower(col(textCol))), "\\s+").as("toks"))
      .withColumn("dl", size(col("toks")).cast("double"))
    val stats = toks.agg(count(lit(1)).cast("double").as("n_docs"),
      sum(col("dl")).as("sum_dl"))
    val tf = toks.select(col("id"), col("dl"), explode(col("toks")).as("term"))
      .filter(col("term").isin(terms: _*))
      .groupBy(col("id"), col("dl"), col("term"))
      .agg(count(lit(1)).cast("double").as("tf"))
    // tf rows are unique per (id, term), so df = row count per term
    val df = tf.groupBy(col("term")).agg(count(lit(1)).cast("double").as("df"))
    tf.join(broadcast(df), "term")
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log((col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))
          + lit(1.0)))
      .withColumn("contrib",
        col("idf") * (col("tf") * (lit(k1) + lit(1.0))) /
          (col("tf") + lit(k1) *
            (lit(1.0) - lit(b) + lit(b) * col("dl") /
              (col("sum_dl") / col("n_docs")))))
      .groupBy(col("id").as(idCol))
      .agg(sum(col("contrib")).as("score"),
        count(lit(1)).cast("long").as("matched_terms"))
      .select(col(idCol), col("score"), col("matched_terms"))
  }
}
