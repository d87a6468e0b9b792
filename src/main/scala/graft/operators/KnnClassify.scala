package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** kNN majority-vote classification — propagate labels from a labeled
  * corpus to unlabeled vectors through their nearest neighbors: weak
  * labeling / label spreading, the curation step that turns a small
  * hand-labeled seed set into corpus-wide labels (topic tags, quality
  * tiers, language families) before sampling or filtering by them.
  *
  * Deliberately COMPOSES instead of embedding a search: input is any
  * `(query_id, neighbor_id, rank)` table, so the same vote runs over
  * [[SimilaritySearch.bruteForceTopK]] (the exactness baseline and the
  * oracle formulation), `ivfTopK`/`lshBandedTopK` (the 100 TB path —
  * recall is the index's concern, not the vote's), or a precomputed
  * neighbor store. The vote itself is two hash aggregates and a
  * |queries|-partitioned rank — negligible next to any search.
  *
  * Determinism: winner by (votes DESC, best_rank ASC, label ASC) — a
  * total order, so the assignment is reproducible and SQL-expressible;
  * best_rank (the label's closest neighbor) is the standard
  * distance-informed tie-break.
  */
object KnnClassify {

  /** One row per query: (query_id, label, votes, best_rank). `labels`
    * maps `labelIdCol` → `labelCol` for every possible neighbor id.
    */
  def vote(neighbors: DataFrame, labels: DataFrame, labelIdCol: String,
      labelCol: String): DataFrame = {
    val lbl = labels.select(col(labelIdCol).as("neighbor_id"),
      col(labelCol).as("_lbl"))
    val tally = neighbors.join(lbl, "neighbor_id")
      .groupBy(col("query_id"), col("_lbl"))
      .agg(count(lit(1)).as("votes"), min(col("rank")).as("best_rank"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("votes").desc, col("best_rank"), col("_lbl"))
    tally.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("query_id"), col("_lbl").as("label"), col("votes"),
        col("best_rank"))
  }
}
