package graft.streaming

import org.apache.spark.sql.SparkSession

/** The micro-batch shuffle-partition rule, in code instead of a
  * footnote: steady-state micro-batches want shuffle partitions sized
  * to batch VOLUME, not cores. The measured cliff (BENCH_full
  * `streaming`, r14): the golden feed in 1000-event batches runs
  * 148 ev/s at cores-sized partitions (32 one-time state-store
  * opens + commits per stateful operator per batch dominate 1000-row
  * batches) and 802 ev/s at 4 — a 5.4x swing from one setting.
  *
  * The rule: `partitions = clamp(ceil(batchRows / targetRows), 1,
  * cores)` with targetRows ≈ 256 (the measured optimum: 1000-row
  * batches peak at 4 partitions = 250 rows each; below ~100 rows per
  * partition, per-partition state-store fixed costs dominate; far
  * above ~1000, single-task skew and lost parallelism do).
  *
  * Caveat that keeps this a STARTUP decision, not a per-batch one:
  * Spark pins a stateful streaming query's state-store partition
  * count at FIRST checkpoint — it cannot change across restarts
  * without rebuilding state. So pick the expected steady-state batch
  * volume once, call [[configure]] before `.start()`, and keep the
  * checkpoint. (Stateless foreachBatch sinks — [[IngestPipeline]] —
  * have no pinned state and may re-apply the rule per batch.)
  */
object MicroBatchTuning {

  /** The measured optimum rows-per-shuffle-partition for small
    * stateful micro-batches on this pipeline family.
    */
  val TargetRowsPerPartition = 256L

  /** Shuffle partitions for an expected steady-state micro-batch
    * volume: batch-volume-proportional, never more than the session's
    * cores (state stores beyond cores only add open/commit overhead),
    * never less than 1.
    */
  def shufflePartitionsFor(expectedBatchRows: Long, cores: Int,
      targetRowsPerPartition: Long = TargetRowsPerPartition): Int = {
    require(expectedBatchRows >= 0 && cores >= 1 && targetRowsPerPartition >= 1)
    val wanted = (expectedBatchRows + targetRowsPerPartition - 1) /
      targetRowsPerPartition
    math.max(1L, math.min(wanted, cores.toLong)).toInt
  }

  /** Apply the rule to the session before starting a streaming query.
    * Returns the chosen partition count. `cores` defaults to the
    * session's scheduler parallelism (= local[N] threads / executor
    * cores).
    */
  def configure(spark: SparkSession, expectedBatchRows: Long,
      cores: Option[Int] = None): Int = {
    val n = shufflePartitionsFor(expectedBatchRows,
      cores.getOrElse(spark.sparkContext.defaultParallelism))
    spark.conf.set("spark.sql.shuffle.partitions", n.toString)
    n
  }

  /** Run `thunk` with the rule applied for one batch's actual volume,
    * restoring the previous setting after — the per-batch variant for
    * STATELESS foreachBatch sinks, where no checkpoint pins the count.
    *
    * Scope caveat (ADVICE r15): `spark.sql.shuffle.partitions` is
    * SESSION-global — any OTHER query planned against the same session
    * while `thunk` runs sees the temporary value. The model this serves
    * is one foreachBatch writer per session (the single-writer sink
    * contract every store here already assumes); a deployment running
    * unrelated concurrent queries should hand the sink its own
    * `spark.newSession()`. Two concurrent withBatchVolume calls on ONE
    * session additionally serialize on the session's conf object below,
    * so the save/restore pair can never interleave and strand the wrong
    * value.
    */
  def withBatchVolume[T](spark: SparkSession, batchRows: Long)(
      thunk: => T): T = spark.conf.synchronized {
    val saved = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions",
      shufflePartitionsFor(batchRows,
        spark.sparkContext.defaultParallelism).toString)
    try thunk
    finally spark.conf.set("spark.sql.shuffle.partitions", saved)
  }
}
