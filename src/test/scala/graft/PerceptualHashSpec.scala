package graft

import graft.functions.PerceptualHashKernel
import graft.operators.Dedup
import graft.sources.MediaColumns
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PerceptualHashSpec extends AnyFunSuite with SparkTestBase {

  private def hashes(p: Array[Byte]): (Option[Long], Option[Long]) = {
    val r = PerceptualHashKernel.compute(p)
    (if (r.isNullAt(0)) None else Some(r.getLong(0)),
      if (r.isNullAt(1)) None else Some(r.getLong(1)))
  }

  test("ascending bytes: every gradient positive -> dhash is all-ones") {
    val p = Array.tabulate[Byte](72)(i => i.toByte)
    val (d, _) = hashes(p)
    assert(d.contains(-1L)) // 64 set bits == -1 in two's complement
  }

  test("descending and constant bytes: no positive gradient -> dhash 0") {
    val desc = Array.tabulate[Byte](72)(i => (100 - i).toByte)
    val const = Array.fill[Byte](72)(42)
    assert(hashes(desc)._1.contains(0L))
    assert(hashes(const)._1.contains(0L))
    // constant: 64*v > sum(v) is never strict -> ahash 0 too
    assert(hashes(const)._2.contains(0L))
  }

  test("ahash marks strictly-above-mean pixels") {
    // 72 bytes, first 36 are 0, last 36 are 100: sampled grid = payload
    // itself (len == 72); the 8x8 subgrid rows 0..3 are all 0 (k < 36
    // iff r*9+c < 36 covers rows 0..3), rows 4..7 are 100
    val p = Array.tabulate[Byte](72)(i => if (i < 36) 0 else 100)
    val (_, a) = hashes(p)
    // above-mean bits are exactly the bits r*8+c for r in 4..7
    val expected = (32 until 64).map(1L << _).sum
    assert(a.contains(expected))
  }

  test("payloads under 72 bytes fingerprint as null (garbage tolerance)") {
    assert(hashes(Array.fill[Byte](71)(1)) == (None, None))
    assert(hashes(Array.empty[Byte]) == (None, None))
  }

  test("byte-doubling (the rescale stand-in) leaves the fingerprint unchanged") {
    val p = Array.tabulate[Byte](72)(i => ((i * 37 + 11) % 251).toByte)
    val doubled = p.flatMap(b => Array(b, b))
    // len 144: sample k reads doubled[(k*144)/72] = doubled[2k] = p[k]
    assert(hashes(p) == hashes(doubled))
  }

  test("hammingPairs64 equals brute force on a seeded signature set") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val sigs = (0 until 80).map(i => (i.toLong, rnd.nextLong())) ++
      // planted close pairs: flip 1..3 bits
      Seq((1000L, 0L), (1001L, 1L << 5), (1002L, (1L << 5) | (1L << 40)),
        (1003L, Long.MinValue), (1004L, Long.MinValue | 3L))
    val df = sigs.toDF("id", "h")
    val got = Dedup.hammingPairs64(df, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val brute = (for {
      (ia, ha) <- sigs; (ib, hb) <- sigs if ia < ib
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 3
    } yield (ia, ib, d)).toSet
    assert(got == brute)
    // byte blocks find the same pairs at this radius
    val got8 = Dedup.hammingPairs64(df, maxHamming = 3, blockBits = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got8 == brute)
  }

  test("maxBlockFreq drops degenerate masses but keeps normal pairs") {
    import spark.implicits._
    // 50 identical all-zero signatures (the degenerate mass) + one
    // close pair of distinctive signatures
    val sigs = (0 until 50).map(i => (i.toLong, 0L)) ++
      Seq((100L, 0x1234567812345678L), (101L, 0x1234567812345679L))
    val df = sigs.toDF("id", "h")
    val capped = Dedup.hammingPairs64(df, maxHamming = 3,
        maxBlockFreq = Some(10L))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == Set((100L, 101L)),
      "hot blocks must be dropped, distinctive pairs kept")
  }

  test("planted near-identical payloads pair up through the media path") {
    import spark.implicits._
    val base = "The quick brown fox jumps over the lazy dog, " * 4 // 180 chars
    // re-encode: change ONE sampled byte (sample k=40 reads index
    // (40*180)/72 = 100) -> at most 2 gradient bits flip
    val near = base.updated(100, 'Q')
    // a genuinely different payload stays unpaired
    val far = base.reverse
    val media = Seq((1L, base), (2L, near), (3L, far))
      .toDF("doc_id", "text")
      .select(col("doc_id"), lit("image").as("media_type"),
        encode(col("text"), "UTF-8").as("payload"))
    val pairs = MediaColumns.nearDupPairs(media, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.map(p => (p._1, p._2)).toSet == Set((1L, 2L)))
    assert(pairs.head._3 <= 2)
  }

  test("withPerceptualHash matches the kernel row by row on real docs") {
    val media = MediaColumns.mediaFromDocuments(
      Tables.documents(spark, "/root/testdata/sf0.001"))
    val rows = MediaColumns.withPerceptualHash(media)
      .select("payload", "phash_d", "phash_a").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (d, a) = hashes(r.getAs[Array[Byte]](0))
      assert((if (r.isNullAt(1)) None else Some(r.getLong(1))) == d)
      assert((if (r.isNullAt(2)) None else Some(r.getLong(2))) == a)
    }
  }
}
