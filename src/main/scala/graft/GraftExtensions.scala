package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.functions.{CdcChunks, DotProductFloat, ImageDims, L2NormalizeFloat, MinGramHash, SqDistLong, TextStats, WavMeta, WinnowFingerprints, ZValue}

/** SparkSessionExtensions entry point: registers graft's native
  * expressions as SQL functions, so `spark.sql("SELECT
  * dot_product_float(a, b)")` works next to the Column API.
  *
  * Usage:
  *   SparkSession.builder()
  *     .withExtensions(new GraftExtensions)        // programmatic
  * or
  *   --conf spark.sql.extensions=graft.GraftExtensions   // cluster-wide
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intArg(fn: String, name: String, e: Expression): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn: $name must be an integer literal, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("dot_product_float"),
      new ExpressionInfo(classOf[DotProductFloat].getName, "dot_product_float"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          s"dot_product_float expects 2 arguments, got ${children.length}")
        DotProductFloat(children.head, children(1))
      }))

    // winnow_fingerprints(text, k, w) — distinct winnowing fingerprint
    // array of a text column (see functions.GramExpressions)
    ext.injectFunction((
      new FunctionIdentifier("winnow_fingerprints"),
      new ExpressionInfo(classOf[WinnowFingerprints].getName, "winnow_fingerprints"),
      (children: Seq[Expression]) => {
        require(children.length == 3,
          s"winnow_fingerprints expects (text, k, w), got ${children.length} args")
        WinnowFingerprints(children.head,
          intArg("winnow_fingerprints", "k", children(1)),
          intArg("winnow_fingerprints", "w", children(2)))
      }))

    // min_gram_hash(text, k) — whole-document rolling min-gram fingerprint
    ext.injectFunction((
      new FunctionIdentifier("min_gram_hash"),
      new ExpressionInfo(classOf[MinGramHash].getName, "min_gram_hash"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          s"min_gram_hash expects (text, k), got ${children.length} args")
        MinGramHash(children.head, intArg("min_gram_hash", "k", children(1)))
      }))

    // text_stats(text) — the fused per-doc counter struct
    ext.injectFunction((
      new FunctionIdentifier("text_stats"),
      new ExpressionInfo(classOf[TextStats].getName, "text_stats"),
      (children: Seq[Expression]) => {
        require(children.length == 1,
          s"text_stats expects 1 argument, got ${children.length}")
        TextStats(children.head)
      }))

    // image_dims(payload) — struct(format, width, height) parsed from
    // PNG/JPEG/GIF container headers in the binary column
    ext.injectFunction((
      new FunctionIdentifier("image_dims"),
      new ExpressionInfo(classOf[ImageDims].getName, "image_dims"),
      (children: Seq[Expression]) => {
        require(children.length == 1,
          s"image_dims expects 1 argument, got ${children.length}")
        ImageDims(children.head)
      }))

    // wav_meta(payload) — struct(audio_format, channels, sample_rate,
    // bits_per_sample) parsed from RIFF/WAVE headers
    ext.injectFunction((
      new FunctionIdentifier("wav_meta"),
      new ExpressionInfo(classOf[WavMeta].getName, "wav_meta"),
      (children: Seq[Expression]) => {
        require(children.length == 1,
          s"wav_meta expects 1 argument, got ${children.length}")
        WavMeta(children.head)
      }))

    // sq_dist_long(a, b) — integer-exact squared L2 distance between two
    // array<bigint> vectors (the k-means kernel)
    ext.injectFunction((
      new FunctionIdentifier("sq_dist_long"),
      new ExpressionInfo(classOf[SqDistLong].getName, "sq_dist_long"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          s"sq_dist_long expects 2 arguments, got ${children.length}")
        SqDistLong(children.head, children(1))
      }))

    // cdc_chunks(text, w, divisor) — content-defined chunk structs
    // (start, len, hash) with resyncing boundaries
    ext.injectFunction((
      new FunctionIdentifier("cdc_chunks"),
      new ExpressionInfo(classOf[CdcChunks].getName, "cdc_chunks"),
      (children: Seq[Expression]) => {
        require(children.length == 3,
          s"cdc_chunks expects (text, w, divisor), got ${children.length} args")
        CdcChunks(children.head, intArg("cdc_chunks", "w", children(1)),
          intArg("cdc_chunks", "divisor", children(2)))
      }))

    // l2_normalize_float(vec) — unit-L2 copy of an array<float>
    ext.injectFunction((
      new FunctionIdentifier("l2_normalize_float"),
      new ExpressionInfo(classOf[L2NormalizeFloat].getName, "l2_normalize_float"),
      (children: Seq[Expression]) => {
        require(children.length == 1,
          s"l2_normalize_float expects 1 argument, got ${children.length}")
        L2NormalizeFloat(children.head)
      }))

    // z_value(x, y) — Morton interleave of two bigint keys (low 16 bits
    // each) for multi-dimensional layout clustering
    ext.injectFunction((
      new FunctionIdentifier("z_value"),
      new ExpressionInfo(classOf[ZValue].getName, "z_value"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          s"z_value expects 2 arguments, got ${children.length}")
        ZValue(children.head, children(1))
      }))
  }
}
