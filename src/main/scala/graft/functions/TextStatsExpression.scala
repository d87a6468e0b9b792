package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused per-document text statistics in ONE pass (plus one pass over the
  * lowercased copy for word hits), replacing the ~10 `regexp_count` scans
  * the token-count / quality / language-ID operators issued per row —
  * language-ID alone (five alternation regexes) was 3s of the sf0.1
  * bench, and every packing/curation query re-pays the token count.
  *
  * Every counter reproduces the corresponding Java-regex semantics
  * BIT-EXACTLY (the relational twins stay in [[TextAnalysis]] as the
  * spec oracle):
  *  - `ws_tokens`: `size(split(trim(text), "\\s+"))` with the empty-
  *    after-trim → 0 rule. Spark's `trim` strips 0x20 SPACES only, and
  *    Spark's `split` is Java split with limit -1: a leading OR trailing
  *    separator each contribute one empty token — so the count is
  *    (maximal non-\s runs) + [starts with residual \s] +
  *    [ends with residual \s].
  *  - `bpe_tokens`: `[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]` — ASCII letter
  *    runs, digit runs, then ONE match per remaining non-ws code point.
  *  - `punct`: `[\p{Punct}]` = ASCII 33-47, 58-64, 91-96, 123-126.
  *  - word hits (`stop/en/de/fr/es`): `\b(w1|...)\b` over `lower(text)`.
  *    Java's `\b` — UNLIKE its ASCII `\w` — bounds words at
  *    `'_' || Character.isLetterOrDigit` transitions (any Unicode letter
  *    or digit: `中the` has NO boundary), so the count equals exact
  *    membership of maximal such-token runs; lowercasing uses
  *    UTF8String.toLowerCase — the same kernel `lower()` uses.
  *  - `zh`: `\p{IsHan}` — one hit per HAN-script code point.
  */
object TextStatsKernel {

  val Schema: StructType = StructType(Seq(
    StructField("ws_tokens", IntegerType, nullable = false),
    StructField("bpe_tokens", IntegerType, nullable = false),
    StructField("punct", IntegerType, nullable = false),
    StructField("stop_hits", IntegerType, nullable = false),
    StructField("en_hits", IntegerType, nullable = false),
    StructField("de_hits", IntegerType, nullable = false),
    StructField("fr_hits", IntegerType, nullable = false),
    StructField("es_hits", IntegerType, nullable = false),
    StructField("zh_hits", IntegerType, nullable = false)))

  private val Stop = Set("the", "a", "an", "and", "of", "to", "in", "is", "it", "that")
  private val En = Set("the", "and", "of", "to", "in", "is")
  private val De = Set("der", "die", "das", "und", "ist", "nicht")
  private val Fr = Set("le", "la", "les", "et", "est", "une")
  private val Es = Set("el", "los", "las", "es", "una", "que")
  private val MaxWordLen = 5 // longest word across the sets ("nicht")

  // Java \s
  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'
  private def isAsciiLetter(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')
  private def isDigit(c: Char): Boolean = c >= '0' && c <= '9'
  // Java \b's word-char set WITHOUT UNICODE_CHARACTER_CLASS:
  // '_' or any Unicode letter-or-digit (openjdk Pattern.Bound.isWord —
  // broader than \w, which stays ASCII)
  private def isBoundWord(cp: Int): Boolean =
    cp == '_' || Character.isLetterOrDigit(cp)
  private def isAsciiPunct(c: Char): Boolean =
    (c >= 33 && c <= 47) || (c >= 58 && c <= 64) ||
      (c >= 91 && c <= 96) || (c >= 123 && c <= 126)

  def compute(text: UTF8String): InternalRow = {
    val s = text.toString
    val len = s.length

    // ---- pass 1 (original text): ws runs, bpe tokens, punct, han ------
    var lo = 0
    var hi = len
    while (lo < hi && s.charAt(lo) == ' ') lo += 1
    while (hi > lo && s.charAt(hi - 1) == ' ') hi -= 1
    var wsTokens = 0
    if (lo < hi) {
      if (isWs(s.charAt(lo))) wsTokens += 1 // leading empty split token
      if (isWs(s.charAt(hi - 1))) wsTokens += 1 // trailing empty (limit -1)
      var i = lo
      var inRun = false
      while (i < hi) {
        val ws = isWs(s.charAt(i))
        if (!ws && !inRun) { wsTokens += 1; inRun = true }
        else if (ws) inRun = false
        i += 1
      }
    }

    var bpe = 0
    var punct = 0
    var zh = 0
    var i = 0
    while (i < len) {
      val cp = s.codePointAt(i)
      val c = s.charAt(i)
      if (isAsciiLetter(c)) {
        bpe += 1
        while (i < len && isAsciiLetter(s.charAt(i))) i += 1
      } else if (isDigit(c)) {
        bpe += 1
        while (i < len && isDigit(s.charAt(i))) i += 1
      } else {
        if (!isWs(c)) bpe += 1 // one match per non-ws code point
        if (c < 128 && isAsciiPunct(c)) punct += 1
        if (Character.UnicodeScript.of(cp) == Character.UnicodeScript.HAN) zh += 1
        i += Character.charCount(cp)
      }
    }

    // ---- pass 2 (lowercased, same kernel as lower()): word hits -------
    val low = text.toLowerCase.toString
    var stop = 0; var en = 0; var de = 0; var fr = 0; var es = 0
    var j = 0
    val llen = low.length
    while (j < llen) {
      val cp0 = low.codePointAt(j)
      if (isBoundWord(cp0)) {
        val start = j
        while (j < llen && isBoundWord(low.codePointAt(j)))
          j += Character.charCount(low.codePointAt(j))
        if (j - start <= MaxWordLen) {
          val tok = low.substring(start, j)
          if (Stop.contains(tok)) stop += 1
          if (En.contains(tok)) en += 1
          if (De.contains(tok)) de += 1
          if (Fr.contains(tok)) fr += 1
          if (Es.contains(tok)) es += 1
        }
      } else j += Character.charCount(cp0)
    }

    new GenericInternalRow(Array[Any](wsTokens, bpe, punct, stop, en, de, fr, es, zh))
  }
}

/** struct(ws_tokens, bpe_tokens, punct, stop_hits, en_hits, de_hits,
  * fr_hits, es_hits, zh_hits) of a text column — one codegen'd call per
  * row into [[TextStatsKernel.compute]].
  */
case class TextStats(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string argument, got ${t.sql}")
  }
  override def dataType: DataType = TextStatsKernel.Schema
  override def prettyName: String = "text_stats"

  override def nullSafeEval(t: Any): Any =
    TextStatsKernel.compute(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextStatsKernel.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Word-repetition counters for Gopher-style quality filtering: machine-
  * generated and template text repeats itself long before it repeats
  * whole documents, so per-doc repetition fractions are the standard
  * complement to exact/near dedup.
  *
  * Tokens are maximal `\S+` runs (regexp_extract_all semantics — no
  * split() empty-token quirks). One pass, one small per-doc hash map:
  * (total_tokens, distinct_tokens, total_bigrams, top_bigram_count).
  */
object RepetitionKernel {

  val Schema: StructType = StructType(Seq(
    StructField("total_tokens", IntegerType, nullable = false),
    StructField("distinct_tokens", IntegerType, nullable = false),
    StructField("total_bigrams", IntegerType, nullable = false),
    StructField("top_bigram", IntegerType, nullable = false)))

  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  def compute(text: UTF8String): InternalRow = {
    val s = text.toString
    val len = s.length
    val toks = new java.util.ArrayList[String]()
    var i = 0
    while (i < len) {
      if (!isWs(s.charAt(i))) {
        val start = i
        while (i < len && !isWs(s.charAt(i))) i += 1
        toks.add(s.substring(start, i))
      } else i += 1
    }
    val n = toks.size
    val distinct = new java.util.HashSet[String](toks)
    var top = 0
    if (n > 1) {
      val counts = new java.util.HashMap[String, Int]()
      var j = 0
      while (j < n - 1) {
        val g = toks.get(j) + " " + toks.get(j + 1)
        val c = counts.merge(g, 1, Integer.sum)
        if (c > top) top = c
        j += 1
      }
    }
    new GenericInternalRow(Array[Any](n, distinct.size, math.max(n - 1, 0), top))
  }
}

/** struct(total_tokens, distinct_tokens, total_bigrams, top_bigram) of a
  * text column — one codegen'd call per row into
  * [[RepetitionKernel.compute]].
  */
case class RepetitionStats(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string argument, got ${t.sql}")
  }
  override def dataType: DataType = RepetitionKernel.Schema
  override def prettyName: String = "repetition_stats"

  override def nullSafeEval(t: Any): Any =
    RepetitionKernel.compute(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RepetitionKernel.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextStatsFunctions {
  def textStats(text: Column): Column =
    Bridge.column(TextStats(Bridge.expression(text)))
  def repetitionStats(text: Column): Column =
    Bridge.column(RepetitionStats(Bridge.expression(text)))
}
