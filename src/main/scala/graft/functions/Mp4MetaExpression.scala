package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** MP4 / ISO-BMFF (ISO 14496-12) container metadata from the binary
  * payload — the video twin of [[ImageDimsKernel]] / [[WavMetaKernel]]:
  * no codec, just the published box grammar walked byte by byte in one
  * codegen'd call per row.
  *
  * Box grammar: `[size u32 BE][type 4cc][payload]`, size includes the
  * 8-byte header; `size == 1` → a u64 `largesize` follows the type
  * (16-byte header, the >4 GiB case); `size == 0` → the box runs to the
  * end of the enclosing scope (legal only for the last box). Walked
  * here:
  *  - `ftyp` (top level): `major_brand` is its first 4 payload bytes;
  *  - `moov` (top level, container): children walked with the same
  *    grammar —
  *     - `mvhd` v0: version/flags u32, creation u32, modification u32,
  *       `timescale` u32, `duration` u32;
  *     - `mvhd` v1: creation/modification u64, `timescale` u32,
  *       `duration` u64 (version 2+ does not exist → corrupt);
  *     - each `trak` child counts one track.
  *
  * A payload parses only if a top-level `ftyp` AND a `moov` holding a
  * well-formed `mvhd` are found with every traversed size in bounds;
  * anything else (truncated, mis-sized, non-MP4 bytes) yields the
  * all-null struct — never an exception, the same garbage-tolerance
  * contract as the image/WAV parsers (at 100 TB some payloads WILL be
  * junk, and row 3 billion must not kill the decode stage).
  */
object Mp4MetaKernel {

  val Schema: StructType = StructType(Seq(
    StructField("major_brand", StringType, nullable = true),
    StructField("timescale", IntegerType, nullable = true),
    StructField("duration", LongType, nullable = true),
    StructField("n_tracks", IntegerType, nullable = true)))

  private def be32(p: Array[Byte], i: Int): Long =
    (((p(i) & 0xFF) << 24) | ((p(i + 1) & 0xFF) << 16) |
      ((p(i + 2) & 0xFF) << 8) | (p(i + 3) & 0xFF)) & 0xFFFFFFFFL
  private def be64(p: Array[Byte], i: Int): Long =
    (be32(p, i) << 32) | be32(p, i + 4)
  private def tag(p: Array[Byte], i: Int, s: String): Boolean =
    p(i) == s.charAt(0).toByte && p(i + 1) == s.charAt(1).toByte &&
      p(i + 2) == s.charAt(2).toByte && p(i + 3) == s.charAt(3).toByte

  private val nulls =
    new GenericInternalRow(Array[Any](null, null, null, null))

  def compute(p: Array[Byte]): InternalRow = {
    if (p.length < 16) return nulls
    var brand: UTF8String = null
    var timescale = -1L
    var duration = -1L
    var tracks = 0
    var sawMvhd = false
    var i = 0
    while (i + 8 <= p.length) {
      var size = be32(p, i)
      var hdr = 8
      if (size == 1L) {
        if (i + 16 > p.length) return nulls
        size = be64(p, i + 8)
        hdr = 16
      } else if (size == 0L) size = (p.length - i).toLong // to EOF
      // negative largesize (bit 63) fails the <hdr check via unsigned
      // semantics: compare as longs, reject anything not in
      // [hdr, remaining]
      if (size < hdr || size > (p.length - i).toLong) return nulls
      if (tag(p, i + 4, "ftyp")) {
        if (size < hdr + 4) return nulls
        brand = UTF8String.fromBytes(
          java.util.Arrays.copyOfRange(p, i + hdr, i + hdr + 4))
      } else if (tag(p, i + 4, "moov")) {
        val end = i + size.toInt
        var j = i + hdr
        while (j + 8 <= end) {
          var cs = be32(p, j)
          var ch = 8
          if (cs == 1L) {
            if (j + 16 > end) return nulls
            cs = be64(p, j + 8)
            ch = 16
          } else if (cs == 0L) cs = (end - j).toLong
          if (cs < ch || cs > (end - j).toLong) return nulls
          if (tag(p, j + 4, "mvhd")) {
            // mvhd is a FullBox: it always carries at least the 4-byte
            // version+flags word — a header-only mvhd (cs == ch) would
            // read past the payload (j + ch can equal p.length when the
            // moov ends at EOF), so reject it before touching the byte
            if (cs < ch + 4) return nulls
            val v = p(j + ch) & 0xFF
            if (v == 0) {
              if (cs < ch + 20) return nulls
              timescale = be32(p, j + ch + 12)
              duration = be32(p, j + ch + 16)
            } else if (v == 1) {
              if (cs < ch + 32) return nulls
              timescale = be32(p, j + ch + 20)
              duration = be64(p, j + ch + 24)
            } else return nulls // mvhd version 2+ does not exist
            sawMvhd = true
          } else if (tag(p, j + 4, "trak")) tracks += 1
          j += cs.toInt
        }
        if (j != end) return nulls // moov children must tile exactly
      }
      i += size.toInt
    }
    // strict tiling: every byte must belong to a well-formed box — a
    // leftover partial header means a truncated file, and truncation is
    // corruption, not padding (same stance as the JPEG segment walk)
    if (i != p.length) return nulls
    // timescale is a u32: values above Int.MaxValue would wrap negative
    // in the output struct — treat them as corrupt like a zero rate
    if (brand == null || !sawMvhd || timescale <= 0 ||
      timescale > Int.MaxValue || duration < 0) nulls
    else new GenericInternalRow(Array[Any](
      brand, timescale.toInt, duration, tracks))
  }
}

/** struct(major_brand, timescale, duration, n_tracks) from a binary MP4
  * payload — one codegen'd call per row into [[Mp4MetaKernel.compute]];
  * all-null struct for non-MP4 bytes.
  */
case class Mp4Meta(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a binary argument, got ${t.sql}")
  }
  override def dataType: DataType = Mp4MetaKernel.Schema
  override def prettyName: String = "mp4_meta"

  override def nullSafeEval(p: Any): Any =
    Mp4MetaKernel.compute(p.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Mp4MetaKernel.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Mp4MetaFunctions {
  def mp4Meta(payload: Column): Column =
    Bridge.column(Mp4Meta(Bridge.expression(payload)))
}
