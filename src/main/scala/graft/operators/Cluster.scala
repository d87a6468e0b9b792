package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Semantic clustering over an embedding column — Lloyd's k-means made
  * DETERMINISTIC and cross-engine exact, the curation primitive the
  * dedup/ANN family stops short of: group a corpus by meaning so a
  * training mix can be balanced per topic (cluster-proportional
  * sampling), inspected per cluster, or pruned cluster-by-cluster.
  *
  * Why an integer formulation: float k-means is not reproducible — the
  * centroid means depend on partial-aggregation order, so two runs (or
  * two engines) drift and the assignments diverge at cluster borders.
  * Here every step is exact integer or bit-pinned IEEE arithmetic:
  *
  *  - vectors are quantized once, `floor(x * scale)` per component with
  *    `scale` a power of two (the multiply is exact in IEEE-754, floor
  *    is exact, so quantization is reproducible bit-for-bit);
  *  - distances are squared-L2 in LONG arithmetic ([[graft.functions.SqDistLong]]
  *    — integer adds are associative, so partitioning can't flip ties);
  *  - argmin ties break to the lowest cluster id (lexicographic
  *    struct-min == `ORDER BY dist, cluster` in any SQL engine);
  *  - centroid updates are `floor(sum / count)` with an exact integer
  *    `sum` — exact while `|sum| < 2^53` (at scale 1024 and unit-norm
  *    embeddings that allows ~8e12 members per cluster);
  *  - seeds are the `k` smallest ids (rank order), no RNG anywhere.
  *
  * Execution shape per iteration (the 100 TB posture):
  *  1. ASSIGN — the k×d centroid matrix is driver-held DATA riding the
  *     codegen references array into ONE constant-code-size argmin
  *     kernel call ([[graft.functions.NearestCentroidLong]]): one
  *     codegen'd projection over the scan, scoring k candidates per row
  *     with the integer distance kernel — code size independent of k.
  *     No join, no aggregate, no shuffle — the corpus never moves.
  *  2. UPDATE — assigned vectors explode to (cluster, dim, component);
  *     partial hash aggregation collapses every partition to ≤ k·d rows
  *     BEFORE the exchange, so the update shuffle is O(partitions · k·d)
  *     regardless of corpus size. The k·d result (a few KB) is collected
  *     to the driver — a bounded collect, same class as the PQ codebook —
  *     which also truncates the lineage each iteration (no exponentially
  *     deep plans, the classic iterative-Spark failure).
  * Empty clusters keep their previous centroid (same rule as the SQL
  * oracle's COALESCE), so `k` never silently shrinks.
  */
object Cluster {

  /** Power of two, so `x * scale` is exact in IEEE-754 — quantization
    * introduces no engine-dependent rounding.
    */
  val DefaultScale = 1024L

  /** The SemDeDup k-scaling rule as a first-class default (Abbas et al.
    * 2023 cluster with k proportional to n): `k = ceil(n /
    * targetCellSize)` holds the EXPECTED cell size constant as the
    * corpus grows, so the within-cell pair join's `sum |cell|^2 ≈
    * n·targetCellSize` cost stays LINEAR in n — with fixed k it is
    * quadratic (each decade of data is a decade of cell size and two
    * decades of pairs). Measured in `ScaleBench`'s `semdedup` section.
    *
    * Regime note: [[kmeansAssignments]] evaluates the argmin as ONE
    * constant-code-size kernel call with the k×d centroid matrix as
    * driver-held DATA ([[graft.functions.NearestCentroidLong]]), so the
    * assignment plan is healthy to k in the tens of thousands — the
    * binding constraints are the k·d driver/broadcast footprint and the
    * O(n·k·d) scoring work itself. Past that, assignment moves to
    * [[assignToJoin]] (centroids as a broadcast TABLE) or a coarse →
    * fine two-level clustering, the paper's own faiss recipe.
    */
  def autoK(n: Long, targetCellSize: Long = 250L): Int = {
    require(targetCellSize > 0, s"targetCellSize must be positive")
    math.max(1L, (n + targetCellSize - 1) / targetCellSize).toInt
  }

  /** `(id, qv)` — each vector quantized to `array<long>` by
    * `floor(x * scale)` per component. The single definition assignment
    * and update both read; exactness argument in the class doc.
    */
  def quantized(emb: DataFrame, idCol: String, vecCol: String,
      scale: Long = DefaultScale): DataFrame = {
    // array<float> takes the codegen'd kernel: the transform() HOF is
    // CodegenFallback and would knock the collapsed quantize+argmin
    // projection out of whole-stage codegen (spec-pinned bit-identical)
    val q = emb.schema(vecCol).dataType match {
      case org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType, _) =>
        VectorFunctions.quantizeFloorF(col(vecCol), scale)
      case _ =>
        transform(col(vecCol),
          x => floor(x.cast("double") * scale).cast("long"))
    }
    emb.select(col(idCol).as("id"), q.as("qv"))
  }

  /** The map-only argmin pass: one [[graft.functions.NearestCentroidLong]]
    * kernel call per row — the centroid matrix rides the codegen
    * references array as DATA, so generated code size is constant in k
    * (the earlier `least()`-over-k-struct-literals form grew linearly
    * with k and fell out of JIT quality past a few dozen centroids:
    * 12.7 s vs 0.5 s at k=80 over 20k vectors). Same arithmetic
    * (integer squared-L2) and the same lexicographic (dist, lowest-id)
    * tie-break, spec-pinned bit-identical. No explode, no aggregate, no
    * shuffle: one codegen'd projection over the scan.
    */
  private def assignExpr(q: DataFrame,
      centroids: Seq[(Int, Array[Long])]): DataFrame = {
    val sorted = centroids.sortBy(_._1)
    val dim = sorted.head._2.length
    val flat = new Array[Long](sorted.size * dim)
    sorted.zipWithIndex.foreach { case ((_, v), i) =>
      System.arraycopy(v, 0, flat, i * dim, dim)
    }
    val m = new graft.functions.CentroidMatrix(flat,
      sorted.map(_._1).toArray, dim)
    q.select(col("id"),
        VectorFunctions.nearestCentroidL(col("qv"), m).as("m"), col("qv"))
      .select(col("id"), col("m.cluster").as("cluster"),
        col("m.dist").as("dist"), col("qv"))
  }

  /** The Lloyd loop: returns the final assignment AND the centroid
    * matrix it was scored against (i.e. after `iters - 1` updates).
    */
  private def lloyd(emb: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int, scale: Long): (DataFrame, Seq[(Int, Array[Long])]) = {
    require(k > 0, s"k must be positive, got $k")
    require(iters > 0, s"iters must be positive, got $iters")
    val q = quantized(emb, idCol, vecCol, scale)

    // seeds: the k smallest ids in rank order — deterministic, no RNG,
    // and expressible as ORDER BY id LIMIT k in any oracle. Bounded
    // collect (k rows).
    var centroids: Seq[(Int, Array[Long])] =
      q.orderBy(col("id")).limit(k).collect().zipWithIndex.map {
        case (r, i) => i -> r.getSeq[Long](1).toArray
      }.toSeq

    var assigned: DataFrame = null
    for (t <- 1 to iters) {
      assigned = assignExpr(q, centroids)
      if (t < iters) {
        // UPDATE: floor-mean per (cluster, dim); k*d rows total — bounded
        // collect that also truncates the iteration's lineage
        val upd = assigned
          .select(col("cluster"), posexplode(col("qv")).as(Seq("dim", "v")))
          .groupBy(col("cluster"), col("dim"))
          .agg(floor(sum(col("v")).cast("double") / count(lit(1)))
            .cast("long").as("val"))
          .collect()
        val byCluster = upd.groupBy(_.getInt(0))
        centroids = centroids.map { case (c, prev) =>
          byCluster.get(c) match {
            case Some(rows) =>
              val arr = new Array[Long](prev.length)
              rows.foreach(r => arr(r.getInt(1)) = r.getLong(2))
              c -> arr
            case None => c -> prev // empty cluster keeps its centroid
          }
        }
      }
    }
    (assigned, centroids)
  }

  /** Final k-means assignment `(id, cluster, dist)` after `iters`
    * assignment rounds (centroids update between rounds, not after the
    * last). `cluster` is the seed rank (0-based over the k smallest
    * ids); `dist` the squared-L2 distance to the assigned centroid in
    * the quantized space.
    */
  def kmeansAssignments(emb: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int, scale: Long = DefaultScale): DataFrame =
    lloyd(emb, idCol, vecCol, k, iters, scale)._1
      .select(col("id"), col("cluster"), col("dist"))

  /** The TRAINED model as data: `(cluster, centroid array<long>)` — the
    * matrix the final [[kmeansAssignments]] round scored against, so
    * `assignTo(train, centroids)` reproduces `kmeansAssignments(train)`
    * exactly. Write it to parquet, reload it tomorrow, and [[assignTo]]
    * classifies each new ingest batch without touching the corpus — the
    * train-once / apply-per-batch split every production clustering
    * pipeline needs.
    */
  def kmeansCentroids(emb: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int, scale: Long = DefaultScale): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    lloyd(emb, idCol, vecCol, k, iters, scale)._2
      .map { case (c, v) => (c, v.toSeq) }
      .toDF("cluster", "centroid")
  }

  /** Classify vectors against a trained centroid table ([[kmeansCentroids]]
    * layout): `(id, cluster, dist)`. The centroids collect to the driver
    * (bounded, k·d longs) and inline into the same map-only codegen'd
    * argmin as training — assigning a batch is one projection over its
    * scan, no join, no shuffle.
    */
  def assignTo(emb: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, scale: Long = DefaultScale): DataFrame = {
    val cents: Seq[(Int, Array[Long])] = centroids
      .select(col("cluster").cast("int"), col("centroid"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Long](1).toArray).toSeq
      .sortBy(_._1)
    require(cents.nonEmpty, "assignTo needs a non-empty centroid table")
    assignExpr(quantized(emb, idCol, vecCol, scale), cents)
      .select(col("id"), col("cluster"), col("dist"))
  }

  /** Join-plan twin of [[assignTo]]: assignment via a BROADCAST JOIN
    * against the centroid TABLE instead of a driver-held matrix. The
    * kernel plan collects k·d longs to the driver and scores all k
    * inside one projection — unbeatable while the matrix fits driver
    * memory comfortably (no join at all, the corpus never moves), but
    * when centroids are themselves the output of a distributed step (or
    * k·d outgrows what a plan reference should carry), they can stay a
    * DataFrame: broadcast-join every row against all k candidates — the
    * same n·k distance evaluations the kernel does inside one
    * expression — then one min_by-style aggregate picks the
    * (dist, cluster)-minimum per id. Identical output to [[assignTo]]
    * (spec-pinned): same integer distance kernel, same lexicographic
    * tie-break.
    *
    * Plan shape: the centroid side is k rows → broadcast hash join; the
    * n·k expansion is join output consumed by a PARTIAL min aggregate
    * in the same stage (never materialized, never shuffled); the only
    * exchange carries ≤ one (id, struct) row per id per partition.
    */
  def assignToJoin(emb: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, scale: Long = DefaultScale): DataFrame = {
    val q = quantized(emb, idCol, vecCol, scale)
    val c = centroids.select(col("cluster").cast("int").as("c_cluster"),
      col("centroid").as("c_vec"))
    q.join(broadcast(c))
      .select(col("id"),
        struct(VectorFunctions.sqDistL(col("qv"), col("c_vec")).as("dist"),
          col("c_cluster").as("cluster")).as("m"))
      .groupBy(col("id"))
      .agg(min(col("m")).as("m"))
      .select(col("id"), col("m.cluster").as("cluster"),
        col("m.dist").as("dist"))
  }

  /** Mean-pooling of embedding GROUPS — the chunk→document reduction: a
    * document's chunks (or an entity's event embeddings) pool to one
    * vector. Same integer-exact arithmetic as the k-means centroid
    * update (quantize → exact long sums → floor-mean), so pooled
    * vectors are reproducible at any parallelism and oracle-checkable.
    * Output is long format `(group_id, dim, qmean)` — the sparse/
    * relational form every downstream op here consumes; [[meanPoolVectors]]
    * reassembles arrays when an ANN/cluster step needs them.
    *
    * Shape: explode is map-side; the only shuffle is the (group, dim)
    * hash aggregate, partial-combined within partitions first.
    */
  def meanPool(emb: DataFrame, groupCol: Column, vecCol: String,
      scale: Long = DefaultScale): DataFrame =
    emb.select(groupCol.as("group_id"),
        posexplode(transform(col(vecCol),
          x => floor(x.cast("double") * scale).cast("long")))
          .as(Seq("dim", "q")))
      .groupBy(col("group_id"), col("dim").cast("long").as("dim"))
      .agg(floor(sum(col("q")).cast("double") / count(lit(1)))
        .cast("long").as("qmean"))

  /** Array form of [[meanPool]]: `(group_id, pooled array<long>)`, the
    * dims reassembled in order via a sorted struct collect (bounded per
    * group at the embedding width).
    */
  def meanPoolVectors(emb: DataFrame, groupCol: Column, vecCol: String,
      scale: Long = DefaultScale): DataFrame =
    meanPool(emb, groupCol, vecCol, scale)
      .groupBy(col("group_id"))
      .agg(transform(
        sort_array(collect_list(struct(col("dim"), col("qmean")))),
        s => s.getField("qmean")).as("pooled"))

  /** Cluster-balanced diverse subset — the consumable end of the
    * clustering chain: the `m` vectors NEAREST their centroid from every
    * cluster (rank by `(dist, id)`), i.e. one small, topic-balanced
    * sample that spans the corpus's semantic spread instead of
    * oversampling its densest region. Plans as a WindowGroupLimit (the
    * rank-filter pattern), so only ~m rows per cluster survive the sort.
    */
  def diverseSample(assignments: DataFrame, m: Int): DataFrame = {
    require(m > 0, s"m must be positive, got $m")
    assignments.withColumn("rank", row_number().over(
        Window.partitionBy(col("cluster")).orderBy(col("dist"), col("id"))))
      .filter(col("rank") <= m)
  }

  /** Prototype-based cluster pruning (Sorscher et al. 2022, "Beyond
    * neural scaling laws: beating power law scaling via data pruning"):
    * rank every member of a cluster by its distance to the cluster
    * centroid and keep a fixed FRACTION per cluster.
    * `hardest = true` (default) keeps the FARTHEST members — the
    * paper's self-supervised-prototypes rule in the data-abundant
    * regime (prototypical examples are redundant; the hard tail carries
    * the training signal). `hardest = false` keeps the nearest — the
    * paper's own crossover when data is scarce. The per-CLUSTER quota
    * (vs a global dist cutoff) is what keeps the kept set
    * topic-balanced: a global cutoff would empty tight clusters first.
    *
    * keep count = `ceil(keepFraction * |cluster|)`, so no non-empty
    * cluster is ever emptied. Deterministic: `dist` is the integer
    * quantized squared-L2 from [[kmeansAssignments]] and ties break by
    * id, so the kept set is a pure function of the corpus.
    *
    * Execution shape: ONE hash exchange on the cluster id; the ordered
    * rank and the unordered per-cluster count are two window passes
    * over the SAME partitioning (no second shuffle — Catalyst reuses
    * the exchange). Nothing is collected or broadcast, so the plan is
    * indifferent to corpus size; a mega-cluster is a skewed sort
    * partition, the same AQE concern as any other window, and bounded
    * in practice because k grows with the corpus (see
    * [[semanticNearDupPairs]]'s cell-size note).
    */
  def prototypePrune(assignments: DataFrame, keepFraction: Double,
      hardest: Boolean = true): DataFrame = {
    require(keepFraction > 0.0 && keepFraction <= 1.0,
      s"keepFraction must be in (0, 1], got $keepFraction")
    val ord =
      if (hardest) Seq(col("dist").desc, col("id").asc)
      else Seq(col("dist").asc, col("id").asc)
    val byCluster = Window.partitionBy(col("cluster"))
    assignments
      .withColumn("rank", row_number().over(byCluster.orderBy(ord: _*)))
      .withColumn("csize", count(lit(1)).over(byCluster))
      .filter(col("rank") <= ceil(lit(keepFraction) * col("csize")))
  }

  /** SemDeDup-style semantic near-dup pairs: k-means cells as the
    * candidate blocks, exact cosine within a cell. (Abbas et al. 2023,
    * "SemDeDup: Data-efficient learning at web-scale through semantic
    * deduplication" — cluster the corpus, then prune cosine-similar
    * pairs WITHIN each cluster only.) The complement of the LSH dedup
    * family: LSH blocks on random projections (recall is probabilistic
    * at the threshold boundary), k-means blocks on the corpus's own
    * density structure (near-dups co-cluster deterministically — the
    * integer argmin assigns identical vectors identically, so an exact
    * duplicate can never cross a cell boundary).
    *
    * Cost/scale posture: the pair join is EQUI on the cluster id, so
    * cost is sum over cells of |cell|^2 — n^2/k in expectation. At
    * 100 TB you grow k with the corpus (the paper uses k ~ n/1e3..1e4,
    * i.e. bounded mean cell size), keeping per-cell work constant;
    * vectors ride the cell shuffle once per side (cheaper than an
    * ids-only pair join-back, which would replicate each vector once
    * per PAIR, |cell|x more). A pathologically hot cell is an AQE
    * skew-join split, same guard as every other candidate join here.
    *
    * Returns `(id_a, id_b, cluster, dist_a, dist_b, cosine)` with
    * id_a < id_b, cosine >= threshold, cosine floored to 1e-4 for
    * cross-engine hash stability (filtering happens on the raw value;
    * dist_* are the integer centroid distances the keep rules key on).
    */
  def semanticNearDupPairs(embs: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int, threshold: Double,
      scale: Long = DefaultScale): DataFrame =
    semanticNearDupPairsFromAssignments(embs,
      kmeansAssignments(embs, idCol, vecCol, k, iters, scale),
      idCol, vecCol, threshold)

  /** [[semanticNearDupPairs]] over a PRECOMPUTED `(id, cluster, dist)`
    * assignment relation (the [[kmeansAssignments]] shape) — the entry
    * point for callers that already hold the assignment (ScaleBench's
    * k-scaling probe derives its candidate-pair count from the same
    * materialized assignment the timed join consumes, instead of
    * re-paying the O(n·k·d) Lloyd pass untimed; ADVICE r17).
    */
  def semanticNearDupPairsFromAssignments(embs: DataFrame,
      asg: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    val dot = graft.functions.VectorFunctions.dotF _
    // norms once per ROW before the pair join — not once per pair
    val side = embs.select(col(idCol).as("id"), col(vecCol).as("v"),
        sqrt(dot(col(vecCol), col(vecCol))).as("nrm"))
      .join(asg, Seq("id"))
    side.as("a").join(side.as("b"),
        col("a.cluster") === col("b.cluster") && col("a.id") < col("b.id"))
      .withColumn("cosine", graft.operators.SimilaritySearch.cosineFromNorms(
        dot(col("a.v"), col("b.v")), col("a.nrm"), col("b.nrm")))
      .filter(col("cosine") >= threshold)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.cluster").cast("long").as("cluster"),
        col("a.dist").as("dist_a"), col("b.dist").as("dist_b"),
        (floor(col("cosine") * 10000) / 10000).as("cosine"))
  }

  /** The consumable end of [[semanticNearDupPairs]]: the corpus with one
    * member of every semantic near-dup pair dropped. Two keep rules:
    *
    *  - `keepFarthest = false` (default): first-wins by id — drop every
    *    id that appears as the larger side of a pair, the convention the
    *    rest of the dedup family uses.
    *  - `keepFarthest = true`: the paper's rule — within a pair, keep
    *    the member FARTHER from its centroid (the less prototypical
    *    example carries more training signal); drop the nearer one,
    *    ties broken to keep the larger id. Deterministic because dist
    *    is integer and (dist, id) is a total order.
    *
    * Victims are a distinct id set; the drop is one left-anti hash join
    * against it (no shuffle of the corpus when victims broadcast).
    */
  def semanticDedupKept(embs: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int, threshold: Double, scale: Long = DefaultScale,
      keepFarthest: Boolean = false): DataFrame = {
    val pairs = semanticNearDupPairs(embs, idCol, vecCol, k, iters,
      threshold, scale)
    val victims =
      if (!keepFarthest) pairs.select(col("id_b").as("victim"))
      else pairs.select(
        when(struct(col("dist_a"), col("id_a")) <
             struct(col("dist_b"), col("id_b")), col("id_a"))
          .otherwise(col("id_b")).as("victim"))
    embs.join(victims.distinct(),
      embs(idCol) === col("victim"), "left_anti")
  }
}
