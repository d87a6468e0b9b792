package graft

import graft.functions.AudioFingerprintKernel
import graft.sources.MediaColumns
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Energy-envelope audio fingerprint + frame-set video near-dup: the
  * invariances that make them CONTENT signals (gain shifts cancel,
  * per-frame perturbations stay local), the planted-recall contracts,
  * and kernel/driver-replay parity.
  */
class AudioVideoFingerprintSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def fp(p: Array[Byte]): Option[Long] = {
    val r = AudioFingerprintKernel.compute(p)
    if (r.isNullAt(0)) None else Some(r.getLong(0))
  }

  private def driverReplay(p: Array[Byte]): Long = {
    val F = 65
    val e = new Array[Long](F); val n = new Array[Long](F)
    p.indices.foreach { i =>
      val k = ((i.toLong * F) / p.length).toInt
      e(k) += p(i) & 0xFF; n(k) += 1
    }
    (0 until 64).foldLeft(0L) { (acc, k) =>
      if (e(k + 1) * n(k) > e(k) * n(k + 1)) acc | (1L << k) else acc
    }
  }

  test("audio fp: rising envelope is all-ones, falling/constant is zero") {
    val rising = Array.tabulate[Byte](130)(i => i.toByte)
    assert(fp(rising).contains(-1L)) // 64 set bits
    val falling = Array.tabulate[Byte](130)(i => (129 - i).toByte)
    assert(fp(falling).contains(0L))
    assert(fp(Array.fill[Byte](200)(42)).contains(0L))
  }

  test("audio fp: exact DC-offset/gain-shift invariance") {
    val rnd = new scala.util.Random(7)
    for (len <- Seq(65, 77, 256, 1000)) {
      val p = Array.fill[Byte](len)((rnd.nextInt(100) + 20).toByte)
      val shifted = p.map(b => (b + 50).toByte) // stays in unsigned range
      assert(fp(p) == fp(shifted),
        s"a uniform +50 sample shift changed the fingerprint at len $len")
    }
  }

  test("audio fp: one-byte re-encode flips at most 2 bits (any position)") {
    val rnd = new scala.util.Random(11)
    for (_ <- 1 to 40) {
      val len = 65 + rnd.nextInt(400)
      val p = Array.fill[Byte](len)(rnd.nextInt(256).toByte)
      val pos = rnd.nextInt(len)
      val q = p.clone(); q(pos) = rnd.nextInt(256).toByte
      val d = java.lang.Long.bitCount(fp(p).get ^ fp(q).get)
      assert(d <= 2, s"one byte at $pos/$len flipped $d bits")
    }
  }

  test("audio fp: short payloads are null; kernel == driver replay") {
    assert(fp(Array.fill[Byte](64)(1)).isEmpty)
    assert(fp(Array.empty[Byte]).isEmpty)
    val rnd = new scala.util.Random(13)
    for (len <- Seq(65, 66, 129, 130, 997)) {
      val p = Array.fill[Byte](len)(rnd.nextInt(256).toByte)
      assert(fp(p).contains(driverReplay(p)))
    }
  }

  test("planted audio re-encodes pair up through the media path, organic don't") {
    val rnd = new scala.util.Random(17)
    def randDoc(seed: Int) = {
      val r = new scala.util.Random(seed)
      Array.fill[Byte](300)((r.nextInt(200) + 30).toByte)
    }
    val base = (1L to 20L).map(i => (i, randDoc(i.toInt)))
    // re-encode = one mid-payload sample changed
    val copies = base.filter(_._1 % 5 == 0).map { case (i, p) =>
      val q = p.clone(); q(150) = (q(150) + 40).toByte
      (i + 1000L, q)
    }
    val media = (base ++ copies).toDF("doc_id", "payload")
    val pairs = MediaColumns.audioNearDupPairs(media, maxHamming = 2)
      .as[(Long, Long, Int)].collect().map(p => (p._1, p._2)).toSet
    assert(pairs == Set((5L, 1005L), (10L, 1010L), (15L, 1015L), (20L, 1020L)),
      s"expected exactly the planted pairs, got $pairs")
  }

  test("video near-dup: per-frame perturbed re-encodes pair, aligned-only") {
    val rnd = new scala.util.Random(23)
    def randDoc(seed: Int) = {
      val r = new scala.util.Random(seed)
      Array.fill[Byte](300)((r.nextInt(200) + 30).toByte)
    }
    val base = (1L to 12L).map(i => (i, randDoc(i.toInt)))
    // re-encode: one byte per frame window (offsets j*64+30)
    val copies = base.filter(_._1 % 3 == 0).map { case (i, p) =>
      val q = p.clone()
      (0 until 4).foreach(j => q(j * 64 + 30) = (q(j * 64 + 30) + 9).toByte)
      (i + 1000L, q)
    }
    // a SHIFTED copy of doc 1: same content, frames land in different
    // slots — temporal alignment must reject it
    val shifted = (2001L, randDoc(1).drop(64) ++ randDoc(1).take(64))
    val media = (base ++ copies :+ shifted).toDF("doc_id", "payload")
    val pairs = MediaColumns.videoNearDupPairs(media)
      .as[(Long, Long, Long)].collect()
    val ids = pairs.map(p => (p._1, p._2)).toSet
    assert(ids == Set((3L, 1003L), (6L, 1006L), (9L, 1009L), (12L, 1012L)),
      s"expected exactly the planted aligned pairs, got $ids")
    assert(pairs.forall(_._3 == 4L), "all four frames should match")
  }

  test("frame hashes drop windows past EOF instead of hashing stubs") {
    val media = Seq((1L, Array.fill[Byte](200)(5))).toDF("doc_id", "payload")
    // len 200: frames at 0..71, 64..135, 128..199 valid; 192..263 short
    val n = MediaColumns.frameHashes(media).count()
    assert(n == 3L)
  }
}
