package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.MicroBatchTuning

class MicroBatchTuningSpec extends AnyFunSuite with SparkTestBase {

  test("the rule: batch-volume-proportional, clamped to [1, cores]") {
    import MicroBatchTuning.shufflePartitionsFor
    // the measured operating point: 1000-row batches -> 4 partitions
    assert(shufflePartitionsFor(1000, 32) === 4)
    // tiny batches never fan out below one row-carrying partition
    assert(shufflePartitionsFor(0, 32) === 1)
    assert(shufflePartitionsFor(1, 32) === 1)
    // huge batches cap at cores (more state stores only add overhead)
    assert(shufflePartitionsFor(1000000, 32) === 32)
    // exact boundary arithmetic (ceil)
    assert(shufflePartitionsFor(256, 32) === 1)
    assert(shufflePartitionsFor(257, 32) === 2)
  }

  test("configure sets the session conf and returns the choice") {
    val saved = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      val n = MicroBatchTuning.configure(spark, 1000, cores = Some(32))
      assert(n === 4)
      assert(spark.conf.get("spark.sql.shuffle.partitions") === "4")
    } finally spark.conf.set("spark.sql.shuffle.partitions", saved)
  }

  test("withBatchVolume applies per-batch and restores after") {
    val saved = spark.conf.get("spark.sql.shuffle.partitions")
    val inside = MicroBatchTuning.withBatchVolume(spark, 1000) {
      spark.conf.get("spark.sql.shuffle.partitions")
    }
    assert(inside.toInt ===
      MicroBatchTuning.shufflePartitionsFor(1000,
        spark.sparkContext.defaultParallelism))
    assert(spark.conf.get("spark.sql.shuffle.partitions") === saved)
    // restores even when the body throws
    intercept[RuntimeException] {
      MicroBatchTuning.withBatchVolume(spark, 5) { throw new RuntimeException }
    }
    assert(spark.conf.get("spark.sql.shuffle.partitions") === saved)
  }
}
