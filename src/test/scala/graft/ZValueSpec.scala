package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{ZValueFunctions, ZValueKernel}
import graft.operators.Layout

/** Morton interleave + z-ordered layout: kernel vs the bit-by-bit
  * definition, quadrant monotonicity, the pruning property the layout
  * exists for (a trailing-dimension filter skips z-tiled partitions but
  * hits EVERY lexicographically-sorted partition), and codegen residency.
  */
class ZValueSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("kernel matches the bit-by-bit definition; corner cases") {
    def reference(x: Long, y: Long): Long = {
      var z = 0L
      var j = 0
      while (j < 16) {
        z |= ((x >> j) & 1L) << (2 * j)
        z |= ((y >> j) & 1L) << (2 * j + 1)
        j += 1
      }
      z
    }
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 2000) {
      val x = rnd.nextLong() & 0xFFFFL
      val y = rnd.nextLong() & 0xFFFFL
      assert(ZValueKernel.compute(x, y) === reference(x, y))
    }
    assert(ZValueKernel.compute(0L, 0L) === 0L)
    assert(ZValueKernel.compute(0xFFFFL, 0L) === 0x55555555L)
    assert(ZValueKernel.compute(0L, 0xFFFFL) === 0xAAAAAAAAL)
    assert(ZValueKernel.compute(0xFFFFL, 0xFFFFL) === 0xFFFFFFFFL)
    // bits above 16 are ignored (callers bound their keys)
    assert(ZValueKernel.compute(0x10003L, 0L) === ZValueKernel.compute(3L, 0L))
  }

  test("quadrant monotonicity: the NW quadrant sorts before the SE quadrant") {
    val half = 1L << 15
    val rnd = new scala.util.Random(11)
    for (_ <- 1 to 500) {
      val nw = ZValueKernel.compute(rnd.nextLong() & (half - 1),
        rnd.nextLong() & (half - 1))
      val se = ZValueKernel.compute(half | (rnd.nextLong() & (half - 1)),
        half | (rnd.nextLong() & (half - 1)))
      assert(nw < se)
    }
  }

  test("z-ordered layout prunes on BOTH dims; lexicographic only on the leading") {
    val n = 64
    val grid = (for { x <- 0 until n; y <- 0 until n }
      yield (x.toLong, y.toLong)).toDF("x", "y")
    val parts = 16

    // partitions whose [min, max] stats on `c` intersect [lo, hi] — the
    // file-level min/max pruning decision a parquet reader makes
    def partsHit(df: DataFrame, c: String, lo: Long, hi: Long): Long = df
      .withColumn("pid", spark_partition_id())
      .groupBy("pid").agg(min(c).as("mn"), max(c).as("mx"))
      .filter(col("mx") >= lo && col("mn") <= hi).count()

    val zOrd = Layout.zOrdered(grid, col("x"), col("y"), parts).cache()
    val lex = grid.repartitionByRange(parts, col("x"), col("y"))
      .sortWithinPartitions("x", "y").cache()
    try {
      // a filter on the TRAILING dimension: z-tiles skip ~3/4 of the
      // partitions, the lexicographic layout scans all of them
      assert(partsHit(lex, "y", 0, 7) === parts)
      assert(partsHit(zOrd, "y", 0, 7) <= 6)
      // the leading dimension prunes in both layouts
      assert(partsHit(lex, "x", 0, 7) <= 4)
      assert(partsHit(zOrd, "x", 0, 7) <= 6)
    } finally {
      zOrd.unpersist(); lex.unpersist()
    }
  }

  test("z_value stays inside WholeStageCodegen over a parquet scan") {
    val df = Tables.events(spark, "/root/testdata/sf0.001")
      .select(ZValueFunctions.zValue(
        col("user_id").bitwiseAND(lit(4095L)),
        col("event_id").bitwiseAND(lit(4095L))).as("zv"))
    val plan = df.queryExecution.executedPlan.toString
    val line = plan.linesIterator.find(_.contains("z_value")).getOrElse("")
    assert(line.trim.matches("""^(\+- )?\*\(\d+\) .*"""),
      s"z_value fell out of codegen: $line")
  }
}
