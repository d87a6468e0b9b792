package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextChunk

/** Sliding-window chunking: coverage without gaps, overlap arithmetic,
  * stop-at-end rule, and the short-document single-chunk case.
  */
class TextChunkSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("chunks overlap by chunk-stride and stop once the end is covered") {
    val text = (1 to 100).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val out = TextChunk.slidingChunks(docs, chunkTokens = 64, stride = 48)
      .as[(Long, Long, String, Long)].collect().sortBy(_._2)
    assert(out.length === 2, "chunk 1 reaches token 100, so no chunk 2")
    val c0 = out(0)._3.split(" ")
    val c1 = out(1)._3.split(" ")
    assert(c0.head === "w1" && c0.last === "w64" && out(0)._4 === 64L)
    assert(c1.head === "w49" && c1.last === "w100" && out(1)._4 === 52L)
    // overlap region w49..w64 appears in both; union covers every token
    assert((c0 ++ c1).toSet === (1 to 100).map(i => s"w$i").toSet)
  }

  test("randomized lengths: full coverage, bounded sizes, contiguous indices") {
    val rnd = new scala.util.Random(13)
    val docs = (1 to 60).map(i =>
      (i.toLong, (1 to (1 + rnd.nextInt(300))).map(t => s"t$t").mkString(" ")))
      .toDF("doc_id", "text")
    val lens = docs.as[(Long, String)].collect()
      .map { case (id, t) => id -> t.split(" ").length }.toMap
    val chunks = TextChunk.slidingChunks(docs, chunkTokens = 32, stride = 24)
      .as[(Long, Long, String, Long)].collect().groupBy(_._1)
    lens.foreach { case (id, len) =>
      val cs = chunks(id).sortBy(_._2)
      assert(cs.map(_._2).toSeq === cs.indices.map(_.toLong).toSeq,
        "contiguous chunk_idx from 0")
      assert(cs.forall(_._4 <= 32L), "no chunk exceeds chunkTokens")
      assert(cs.dropRight(1).forall(_._4 === 32L), "only the last may be short")
      // the last chunk reaches the end; union of tokens covers the doc
      val covered = cs.flatMap(_._3.split(" ")).toSet
      assert(covered.size === len, s"doc $id: covered ${covered.size} of $len")
    }
  }

  test("short document yields exactly one short chunk") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    val out = TextChunk.slidingChunks(docs, chunkTokens = 64, stride = 48)
      .as[(Long, Long, String, Long)].collect()
    assert(out.toSeq === Seq((1L, 0L, "a b c", 3L)))
  }

  test("exact-multiple length: the covering chunk is the last") {
    val text = (1 to 64).map(i => s"w$i").mkString(" ")
    val out = TextChunk.slidingChunks(Seq((1L, text)).toDF("doc_id", "text"),
        chunkTokens = 64, stride = 48)
      .as[(Long, Long, String, Long)].collect()
    assert(out.length === 1 && out.head._4 === 64L,
      "chunk 0 covers all 64 tokens; start 48 must not emit")
  }
}
