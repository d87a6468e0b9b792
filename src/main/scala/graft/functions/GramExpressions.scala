package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DataTypes, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native k-char-gram hashing for document fingerprinting.
  *
  * The relational formulation (posexplode one row PER CHARACTER, stitch
  * grams with `lead` windows, hash, min over a second window) multiplies
  * the corpus by its character count through two hash-partitioned window
  * stages — it was the dominant cost of `doc_winnow_fingerprints` at
  * sf0.1. These expressions do the whole per-document computation in one
  * codegen'd pass: no row blowup, no window shuffle, output already
  * distinct per document. Winnowing a corpus becomes a pure map stage.
  *
  * Hashing matches [[TextHash.hash60]] bit-for-bit (first 15 hex chars of
  * the md5 = top 60 bits of the first 8 digest bytes), so oracle SQL and
  * the relational twins agree exactly. Positions are Java chars — the
  * same code units `split(text, '')`/`substr` walk; the corpus is ASCII
  * (verified octet_length == length, see media_metadata note).
  */
object GramHashes {

  private val md = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  /** TextHash.hash60 on the JVM: top 60 bits of the md5 digest. */
  def hash60(s: String): Long = {
    val d = md.get()
    d.reset()
    val b = d.digest(s.getBytes(StandardCharsets.UTF_8))
    val v = ((b(0) & 0xffL) << 56) | ((b(1) & 0xffL) << 48) |
      ((b(2) & 0xffL) << 40) | ((b(3) & 0xffL) << 32) |
      ((b(4) & 0xffL) << 24) | ((b(5) & 0xffL) << 16) |
      ((b(6) & 0xffL) << 8) | (b(7) & 0xffL)
    v >>> 4
  }

  /** hash60 of every k-gram at positions 0..max(len-k,0): a doc shorter
    * than k chars yields its whole text as the single gram — identical to
    * [[TextHash.charShingles]] and the oracle's substr loop.
    *
    * Gram positions are CODE POINTS, the unit SQL `substr` counts in both
    * Spark and DuckDB. The fast path walks UTF-16 code units, valid
    * whenever the string has no supplementary characters (all BMP text,
    * not just ASCII); any surrogate pair routes to the code-point walk so
    * a non-BMP corpus fingerprints identically to the oracles instead of
    * silently diverging.
    */
  private def gramHashes(text: UTF8String, k: Int): Array[Long] = {
    val s = text.toString
    val len = s.length
    if (s.codePointCount(0, len) == len) {
      val m = math.max(len - k, 0) + 1
      val out = new Array[Long](m)
      var p = 0
      while (p < m) {
        out(p) = hash60(s.substring(p, math.min(p + k, len)))
        p += 1
      }
      out
    } else {
      val cps = s.codePoints().toArray
      val n = cps.length
      val m = math.max(n - k, 0) + 1
      val out = new Array[Long](m)
      var p = 0
      while (p < m) {
        out(p) = hash60(new String(cps, p, math.min(k, n - p)))
        p += 1
      }
      out
    }
  }

  /** Winnowing selection: distinct minima of every window of w
    * consecutive gram hashes (full windows only). Docs with fewer than w
    * grams — shorter than k+w-1 chars — produce NO fingerprints by
    * default: they are below winnowing's guarantee length and are covered
    * by the whole-text [[minGram]] / exact-dedup paths instead.
    * `coverShort` lifts that floor by emitting the single partial-window
    * minimum (= [[minGram]]) for such docs, for pipelines that run the
    * winnow path without a separate exact-dedup pass.
    */
  def winnow(text: UTF8String, k: Int, w: Int, coverShort: Boolean): ArrayData = {
    val h = gramHashes(text, k)
    if (h.length < w) {
      if (!coverShort) return new GenericArrayData(Array.empty[Long])
      var mn = h(0)
      var i = 1
      while (i < h.length) {
        if (h(i) < mn) mn = h(i)
        i += 1
      }
      return new GenericArrayData(Array(mn))
    }
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var p = w - 1
    while (p < h.length) {
      var mn = h(p - w + 1)
      var j = p - w + 2
      while (j <= p) {
        if (h(j) < mn) mn = h(j)
        j += 1
      }
      seen.add(mn)
      p += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var i = 0
    while (it.hasNext) {
      out(i) = it.next()
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Content-defined chunking (storage-dedup lineage: LBFS/rsync,
    * Rabin-style): a chunk boundary falls after every position whose
    * trailing w-gram hash satisfies `hash % divisor == 0`, plus a final
    * boundary at end-of-text. Because boundaries depend only on LOCAL
    * content, an insertion or edit re-chunks just its neighborhood and
    * the stream RESYNCS — the chunks after the edit are byte-identical
    * to the original's, which fixed-width blocking can never achieve.
    * Expected chunk length == divisor chars.
    *
    * One pass per document: no per-character explode, no window shuffle
    * (the relational formulation is the oracle, not the plan). Returns
    * `array<struct<start int, len int, hash long>>` — 1-based code-point
    * start, chunk length, and [[hash60]] of the chunk text; empty text
    * yields an empty array, text shorter than w one whole-text chunk.
    *
    * Deliberately no min/max chunk-size clamp: the greedy accept-if-far-
    * enough rule is sequential state a fused kernel adds trivially, but
    * it would make the cut set non-relational and the cross-engine
    * oracle recursive; resync behavior is unaffected.
    */
  def cdcChunks(text: UTF8String, w: Int, divisor: Int): ArrayData = {
    val s0 = text.toString
    val bmp = s0.codePointCount(0, s0.length) == s0.length
    val cps: Array[Int] = if (bmp) null else s0.codePoints().toArray
    val len = if (bmp) s0.length else cps.length
    if (len == 0) return new GenericArrayData(Array.empty[Any])
    def slice(from: Int, until: Int): String =
      if (bmp) s0.substring(from, until) else new String(cps, from, until - from)
    val cuts = new java.util.ArrayList[Integer]()
    var c = w
    while (c <= len) {
      if (hash60(slice(c - w, c)) % divisor == 0) cuts.add(c)
      c += 1
    }
    if (cuts.isEmpty || cuts.get(cuts.size - 1) != len) cuts.add(len)
    val out = new Array[Any](cuts.size)
    var prev = 0
    var i = 0
    while (i < cuts.size) {
      val end = cuts.get(i).intValue()
      out(i) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](prev + 1, end - prev, hash60(slice(prev, end))))
      prev = end
      i += 1
    }
    new GenericArrayData(out)
  }

  /** [[hash60]] straight off a UTF8String's bytes (identical: md5 over
    * the same UTF-8 byte sequence, no intermediate java.lang.String).
    */
  def hash60(u: UTF8String): Long = {
    val d = md.get()
    d.reset()
    val b = d.digest(u.getBytes)
    val v = ((b(0) & 0xffL) << 56) | ((b(1) & 0xffL) << 48) |
      ((b(2) & 0xffL) << 40) | ((b(3) & 0xffL) << 32) |
      ((b(4) & 0xffL) << 24) | ((b(5) & 0xffL) << 16) |
      ((b(6) & 0xffL) << 8) | (b(7) & 0xffL)
    v >>> 4
  }

  /** Whitespace tokens of `trim(text)` split on `\s+` — byte-identical
    * to Spark's `split(trim(text), "\\s+")` (UTF8String.trim strips
    * ASCII 0x20 exactly like StringTrim; the split is the same Java
    * regex with limit -1). Empty text yields the single empty token,
    * matching the relational stream.
    */
  private def wsTokens(text: UTF8String): Array[String] =
    text.trim().toString.split("\\s+", -1)

  /** DISTINCT word n-gram shingles of a doc, first-occurrence order —
    * the set the relational `posexplode + lead-window + distinct`
    * pipeline builds ([[graft.operators.Dedup]] shingleRows), in one
    * per-row pass: a doc with fewer than n tokens yields its single
    * whole-doc join (concat_ws skips the missing tail), longer docs one
    * shingle per start position, deduplicated.
    */
  def wordShingleSet(text: UTF8String, n: Int): Array[String] = {
    val t = wsTokens(text)
    if (t.length <= n) Array(t.mkString(" "))
    else {
      val seen = new java.util.LinkedHashSet[String]()
      var i = 0
      val last = t.length - n
      val sb = new java.lang.StringBuilder()
      while (i <= last) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(t(i + j))
          j += 1
        }
        seen.add(sb.toString)
        i += 1
      }
      val out = new Array[String](seen.size)
      seen.toArray(out)
      out
    }
  }

  private def toUtf8Array(a: Array[String]): ArrayData =
    new GenericArrayData(a.map(s => UTF8String.fromString(s): Any))

  def wordShingles(text: UTF8String, n: Int): ArrayData =
    toUtf8Array(wordShingleSet(text, n))

  /** EVERY word-shingle occurrence with its 0-based start position —
    * (pos, shingle) structs, the positioned stream
    * [[graft.operators.Dedup.alignedSpanPairs]] aligns on.
    */
  def wordShinglePositions(text: UTF8String, n: Int): ArrayData = {
    val t = wsTokens(text)
    if (t.length <= n)
      new GenericArrayData(Array[Any](
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](0, UTF8String.fromString(t.mkString(" "))))))
    else {
      val last = t.length - n
      val out = new Array[Any](last + 1)
      val sb = new java.lang.StringBuilder()
      var i = 0
      while (i <= last) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(t(i + j))
          j += 1
        }
        out(i) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](i, UTF8String.fromString(sb.toString)))
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  /** MinHash signature straight from text: hash60 of each DISTINCT
    * shingle, then `numHashes` affine mixes ([[TextHash.mixSeeded]]'s
    * exact arithmetic) with a running min each — the whole
    * [[graft.operators.Dedup.minHashSignatures]] pipeline as one
    * map-only kernel (was: explode + two window exchanges + one
    * aggregate exchange per corpus).
    */
  def minHashSig(text: UTF8String, n: Int, numHashes: Int): ArrayData = {
    val consts = mixConstantsCached(numHashes)
    val mins = new Array[Long](numHashes)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val sh = wordShingleSet(text, n)
    var i = 0
    while (i < sh.length) {
      val h = hash60(sh(i))
      val lo = h & 0x3FFFFFFFL
      val hi = h >> 30
      var k = 0
      while (k < numHashes) {
        val (a, b, c) = consts(k)
        val m = (a * lo + b * hi + c) % TextHash.Mersenne61
        if (m < mins(k)) mins(k) = m
        k += 1
      }
      i += 1
    }
    new GenericArrayData(mins.map(x => x: Any))
  }

  /** SimHash over word `n`-shingles packed into a long — the
    * [[graft.operators.Dedup.simHashes]] aggregate as one per-row pass
    * (bit b set iff the +1/-1 sum over distinct-shingle hash bits is
    * positive).
    */
  def simHashPacked(text: UTF8String, n: Int, bits: Int): Long = {
    val sh = wordShingleSet(text, n)
    val sums = new Array[Int](bits)
    var i = 0
    while (i < sh.length) {
      val h = hash60(sh(i))
      var b = 0
      while (b < bits) {
        if (((h >> b) & 1L) == 1L) sums(b) += 1 else sums(b) -= 1
        b += 1
      }
      i += 1
    }
    var packed = 0L
    var b = 0
    while (b < bits) {
      if (sums(b) > 0) packed |= (1L << b)
      b += 1
    }
    packed
  }

  private val mixCache =
    new java.util.concurrent.ConcurrentHashMap[Int, Array[(Long, Long, Long)]]()
  private def mixConstantsCached(k: Int): Array[(Long, Long, Long)] =
    mixCache.computeIfAbsent(k, kk => TextHash.mixConstants(kk))

  /** Whole-document fingerprint: min gram hash (array_min of the gram
    * hashes — the [[TextAnalysis.withFingerprint]] kernel).
    */
  def minGram(text: UTF8String, k: Int): Long = {
    val h = gramHashes(text, k)
    var mn = h(0)
    var i = 1
    while (i < h.length) {
      if (h(i) < mn) mn = h(i)
      i += 1
    }
    mn
  }
}

private[functions] trait GramExpression extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string argument, got ${t.sql}")
  }
}

/** array<long> of the distinct winnowing fingerprints of a text column —
  * one codegen'd call per row into [[GramHashes.winnow]]. `coverShort`
  * emits the partial-window minimum for docs below the k+w-1 guarantee
  * length instead of nothing (see [[GramHashes.winnow]]).
  */
case class WinnowFingerprints(child: Expression, k: Int, w: Int,
    coverShort: Boolean = false) extends GramExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fingerprints"

  override def nullSafeEval(t: Any): Any =
    GramHashes.winnow(t.asInstanceOf[UTF8String], k, w, coverShort)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.GramHashes.winnow($c, $k, $w, $coverShort)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Content-defined chunks of a text column — one codegen'd call per row
  * into [[GramHashes.cdcChunks]] (w-gram boundary test, `hash % divisor
  * == 0`, final cut at end-of-text).
  */
case class CdcChunks(child: Expression, w: Int, divisor: Int)
    extends GramExpression {
  override def dataType: DataType = ArrayType(
    DataTypes.createStructType(Array(
      DataTypes.createStructField("start", DataTypes.IntegerType, false),
      DataTypes.createStructField("len", DataTypes.IntegerType, false),
      DataTypes.createStructField("hash", DataTypes.LongType, false))),
    containsNull = false)
  override def prettyName: String = "cdc_chunks"

  override def nullSafeEval(t: Any): Any =
    GramHashes.cdcChunks(t.asInstanceOf[UTF8String], w, divisor)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.GramHashes.cdcChunks($c, $w, $divisor)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Distinct word n-gram shingles of a text column (set semantics,
  * first-occurrence order) — one codegen'd call per row.
  */
case class WordShingleArray(child: Expression, n: Int)
    extends GramExpression {
  // containsNull/nullable mirror the relational formulation (and the
  // parquet round-trip, whose reader reports nullable elements — the
  // DeltaLog schema guard compares them)
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "word_shingle_array"

  override def nullSafeEval(t: Any): Any =
    GramHashes.wordShingles(t.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.GramHashes.wordShingles($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Every word-shingle occurrence with its 0-based position. */
case class WordShinglePositions(child: Expression, n: Int)
    extends GramExpression {
  override def dataType: DataType = ArrayType(
    DataTypes.createStructType(Array(
      DataTypes.createStructField("pos", DataTypes.IntegerType, false),
      DataTypes.createStructField("s", DataTypes.StringType, true))),
    containsNull = false)
  override def prettyName: String = "word_shingle_positions"

  override def nullSafeEval(t: Any): Any =
    GramHashes.wordShinglePositions(t.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.GramHashes.wordShinglePositions($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** MinHash signature of a text column over word n-shingles. */
case class MinHashSig(child: Expression, n: Int, numHashes: Int)
    extends GramExpression {
  // nullable elements: the relational CreateArray was nullable and the
  // signature stores' parquet round-trip reads back nullable — the
  // DeltaLog schema guard requires the delta to match the store
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(t: Any): Any =
    GramHashes.minHashSig(t.asInstanceOf[UTF8String], n, numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.GramHashes.minHashSig($c, $n, $numHashes)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Packed SimHash of a text column over word n-shingles. */
case class SimHashPacked(child: Expression, n: Int, bits: Int)
    extends GramExpression {
  override def dataType: DataType = DataTypes.LongType
  override def prettyName: String = "simhash_packed"

  override def nullSafeEval(t: Any): Any =
    GramHashes.simHashPacked(t.asInstanceOf[UTF8String], n, bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.GramHashes.simHashPacked($c, $n, $bits)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** [[TextHash.hash60]] as ONE codegen'd call — the relational
  * formulation (conv(substring(md5(x),1,15),16,10)) materializes the
  * 32-char hex string and re-parses it per row; this computes the same
  * 60 bits straight from the digest. Used by [[TextHash.hash60]]
  * itself, so every hashing call site in the engine gets the kernel.
  */
case class Hash60(child: Expression) extends GramExpression {
  override def dataType: DataType = DataTypes.LongType
  override def prettyName: String = "hash60"

  override def nullSafeEval(t: Any): Any =
    GramHashes.hash60(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GramHashes.hash60($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Min gram hash of a text column (whole-document rolling fingerprint). */
case class MinGramHash(child: Expression, k: Int) extends GramExpression {
  override def dataType: DataType = DataTypes.LongType
  override def prettyName: String = "min_gram_hash"

  override def nullSafeEval(t: Any): Any =
    GramHashes.minGram(t.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GramHashes.minGram($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Column-level API for the gram expressions. */
object GramFunctions {
  def winnowFingerprints(text: Column, k: Int, w: Int,
      coverShort: Boolean = false): Column =
    Bridge.column(WinnowFingerprints(Bridge.expression(text), k, w, coverShort))
  def minGramHash(text: Column, k: Int): Column =
    Bridge.column(MinGramHash(Bridge.expression(text), k))
  def cdcChunks(text: Column, w: Int, divisor: Int): Column =
    Bridge.column(CdcChunks(Bridge.expression(text), w, divisor))
  def wordShingleArray(text: Column, n: Int): Column =
    Bridge.column(WordShingleArray(Bridge.expression(text), n))
  def wordShinglePositions(text: Column, n: Int): Column =
    Bridge.column(WordShinglePositions(Bridge.expression(text), n))
  def minHashSig(text: Column, n: Int, numHashes: Int): Column =
    Bridge.column(MinHashSig(Bridge.expression(text), n, numHashes))
  def simHashPacked(text: Column, n: Int, bits: Int): Column =
    Bridge.column(SimHashPacked(Bridge.expression(text), n, bits))
  def hash60(s: Column): Column =
    Bridge.column(Hash60(Bridge.expression(s)))
}
