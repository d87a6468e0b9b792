package graft

import graft.functions.{GramFunctions, GramHashes}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CdcChunksSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private val W = 8
  private val D = 64

  /** Independent per-string reference (the oracle SQL is the cross-engine
    * check; this guards the codegen'd kernel against the spec'd rule).
    */
  private def naive(s: String): Seq[(Int, Int, Long)] = {
    val len = s.length
    if (len == 0) return Nil
    val cand = (W to len).filter(c =>
      GramHashes.hash60(s.substring(c - W, c)) % D == 0)
    val cuts = if (cand.nonEmpty && cand.last == len) cand else cand :+ len
    var prev = 0
    cuts.map { c =>
      val t = (prev + 1, c - prev, GramHashes.hash60(s.substring(prev, c)))
      prev = c; t
    }
  }

  private def chunksOf(rows: Seq[String]) = {
    import spark.implicits._
    rows.toDF("text")
      .select(posexplode(GramFunctions.cdcChunks(col("text"), W, D)))
      .select("col.start", "col.len", "col.hash")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
  }

  test("kernel matches the per-string reference on real docs") {
    val texts = Tables.documents(spark, sf).select("text")
      .limit(50).collect().map(_.getString(0))
    for (t <- texts) {
      val got = chunksOf(Seq(t)).toSeq
      assert(got == naive(t), s"mismatch on: ${t.take(60)}")
    }
  }

  test("chunks tile the document exactly") {
    val texts = Tables.documents(spark, sf).select("text")
      .limit(20).collect().map(_.getString(0))
    for (t <- texts) {
      val ch = naive(t)
      assert(ch.map(_._2).sum == t.length)
      assert(ch.head._1 == 1)
      // starts are cumulative: each chunk begins where the last ended
      ch.foldLeft(1) { case (expectStart, (s0, l, _)) =>
        assert(s0 == expectStart); expectStart + l
      }
    }
  }

  test("short and empty texts degrade to whole-text / nothing") {
    assert(chunksOf(Seq("tiny")).toSeq ==
      Seq((1, 4, GramHashes.hash60("tiny"))))
    assert(chunksOf(Seq("")).isEmpty)
  }

  test("fuzz: kernel matches the reference on random short strings") {
    val rnd = new scala.util.Random(11)
    val alpha = "ab \txy."
    val texts = (0 until 200).map { _ =>
      val len = rnd.nextInt(30)
      (0 until len).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
    }
    for (t <- texts) assert(chunksOf(Seq(t)).toSeq == naive(t), s"on [$t]")
  }

  test("non-BMP text chunks by code points, not UTF-16 units") {
    // U+1F600 is a surrogate pair in UTF-16; positions must count code
    // points (the unit SQL substr counts in both engines)
    val t = "hello 😀 world of chunked text streams"
    val cps = t.codePoints().toArray
    def cpSlice(a: Int, b: Int) = new String(cps, a, b - a)
    val len = cps.length
    val cand = (W to len).filter(c =>
      GramHashes.hash60(cpSlice(c - W, c)) % D == 0)
    val cuts = if (cand.nonEmpty && cand.last == len) cand else cand :+ len
    var prev = 0
    val want = cuts.map { c =>
      val r = (prev + 1, c - prev, GramHashes.hash60(cpSlice(prev, c)))
      prev = c; r
    }
    assert(chunksOf(Seq(t)).toSeq == want)
    // tiling is in code points: lens sum to the code-point count
    assert(want.map(_._2).sum == len)
  }

  test("boundaries resync after an edit (the CDC property)") {
    val base = Tables.documents(spark, sf).select("text")
      .orderBy("doc_id").limit(5).collect().map(_.getString(0))
      .filter(_.length > 200)
    assert(base.nonEmpty)
    for (t <- base) {
      val orig = naive(t).map(_._3).toSet
      // suffix append: every chunk except the last survives
      val suffixed = naive(t + " extradup token").map(_._3)
      assert(suffixed.dropRight(1).forall(orig.contains))
      // prefix edit: chunking resyncs at the first post-edit boundary —
      // most original chunks reappear; fixed-width blocking would share 0
      val prefixed = naive("PREFIX EDIT " + t).map(_._3).toSet
      val sharedFrac = orig.count(prefixed.contains).toDouble / orig.size
      assert(sharedFrac >= 0.5, s"resync failed: $sharedFrac")
    }
  }
}
