package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fuzzy record linkage — find pairs of records whose names are within
  * a small edit distance, without a cross join. This is the entity-
  * resolution primitive (duplicate customer records, near-identical
  * author strings, mis-keyed ids) that a curation pipeline runs before
  * any per-entity aggregate can be trusted.
  *
  * Blocking is the whole game at scale: naive fuzzy matching is
  * O(n²) levenshtein calls. For edit distance ≤ 1 there is an EXACT
  * candidate generator — the deletion neighborhood (FastSS / SymSpell
  * family): emit, for every string, the string itself plus each
  * delete-one-character variant. Two strings within edit distance 1
  * ALWAYS share a key:
  *
  *  - equal strings share the identity key;
  *  - a substitution at position i: deleting position i from both
  *    sides yields the same string;
  *  - an insertion/deletion: deleting the inserted character from the
  *    longer side yields the shorter side's identity key.
  *
  * So candidates = a self-equi-join on the exploded key column — a
  * plain shuffle join Catalyst handles like any other, followed by one
  * `levenshtein` filter to drop the (few) false candidates a shared
  * key admits. Cost: |rows| × (len+1) key rows into the shuffle, then
  * per-bucket pairs; a deletion key of length L−1 is shared by at most
  * |alphabet|·L strings that could exist, so buckets are bounded and
  * there is no quadratic blow-up unless the DATA is one giant
  * near-duplicate class (in which case the output itself is
  * quadratic). Distances ≥ 2 need |Σ|^d-sized neighborhoods — that
  * regime belongs to the n-gram/MinHash family next door
  * ([[Dedup.ngramJaccardPairs]]), which trades exactness for a banded
  * equi-join; this operator is the EXACT short-range complement.
  *
  * Reference analogue: the trip matcher's exact-key equality join
  * (lambda2.py:66-109) assumes clean keys; this is the operator you
  * run when keys are typed by humans.
  */
object EntityMatch {

  /** All pairs `(id_a, id_b)` with `id_a < id_b` whose `nameCol`
    * values are within edit distance 1, via deletion-neighborhood
    * blocking. Output: (id_a, id_b, name_a, name_b, dist), dist an
    * INT (0 = identical names on distinct ids).
    */
  def fuzzyPairs(df: DataFrame, idCol: String, nameCol: String): DataFrame = {
    // key 0 = the string itself; key i (1-based) = delete position i.
    // materialized once: both self-join sides scan it, and its lineage
    // (scan + explode) would otherwise run twice
    val keyed = Dedup.sharedRelation(
      df.select(col(idCol).as("_id"), col(nameCol).as("_name"))
        .withColumn("_k", explode(expr(
          """transform(sequence(0, length(_name)),
            |  i -> if(i = 0, _name,
            |          concat(substring(_name, 1, i - 1),
            |                 substring(_name, i + 1, length(_name)))))"""
            .stripMargin))))
    val a = keyed.select(col("_id").as("id_a"), col("_name").as("name_a"),
      col("_k"))
    val b = keyed.select(col("_id").as("id_b"), col("_name").as("name_b"),
      col("_k"))
    // levenshtein BEFORE the distinct: the verify filter is a codegen'd
    // per-row op, the distinct is a shuffle — dropping false candidates
    // first means the dedup exchange carries only true pairs (each
    // duplicated at most a handful of times by multi-key sharing), not
    // the full candidate set.
    a.join(b, Seq("_k"))
      .filter(col("id_a") < col("id_b") &&
        levenshtein(col("name_a"), col("name_b")) <= 1)
      .select(col("id_a"), col("id_b"), col("name_a"), col("name_b"))
      .distinct() // a pair can share several deletion keys — keep one
      .withColumn("dist",
        levenshtein(col("name_a"), col("name_b")).cast("int"))
  }
}
