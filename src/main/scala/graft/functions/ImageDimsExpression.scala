package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** REAL media header decode over the opaque `binary` payload column —
  * the honest core of the multimodal story beyond frame sampling: no
  * codec library, just the published container formats, parsed byte by
  * byte in one codegen'd call per row (sibling of [[TextStatsKernel]]).
  *
  *  - PNG (RFC 2083): 8-byte signature `89 50 4E 47 0D 0A 1A 0A`, then
  *    the IHDR chunk must come first — length(4 BE) type `IHDR`(4) —
  *    with width/height as the first two big-endian u32 of its data.
  *  - JPEG (ITU T.81): starts with SOI `FF D8`; segments are
  *    `FF <marker> <len u16 BE incl itself> <payload>`. Dimensions live
  *    in the first start-of-frame marker (SOF0-15 = C0-CF minus C4/C8/CC
  *    which are huffman/arithmetic tables): `[len][precision u8]
  *    [height u16][width u16]`. Standalone markers (TEM, RSTn) carry no
  *    length; fill bytes `FF` before a marker are legal and skipped.
  *  - GIF (87a/89a): `GIF87a`/`GIF89a`, then logical-screen
  *    width/height as LITTLE-endian u16 at offsets 6/8.
  *
  * Anything else (truncated, corrupt, or a non-image payload) yields an
  * all-null struct — never an exception: at 100 TB some payloads WILL be
  * garbage, and a decode stage that throws on row 3 billion is useless.
  */
object ImageDimsKernel {

  val Schema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = true),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true)))

  private def be32(p: Array[Byte], i: Int): Int =
    ((p(i) & 0xFF) << 24) | ((p(i + 1) & 0xFF) << 16) |
      ((p(i + 2) & 0xFF) << 8) | (p(i + 3) & 0xFF)
  private def be16(p: Array[Byte], i: Int): Int =
    ((p(i) & 0xFF) << 8) | (p(i + 1) & 0xFF)
  private def le16(p: Array[Byte], i: Int): Int =
    (p(i) & 0xFF) | ((p(i + 1) & 0xFF) << 8)

  // non-positive dims = corrupt header (a >2^31 PNG u32 reads negative;
  // a zeroed field reads 0): reject rather than return garbage geometry
  private def row(fmt: String, w: Int, h: Int): InternalRow =
    if (w > 0 && h > 0)
      new GenericInternalRow(Array[Any](UTF8String.fromString(fmt), w, h))
    else null
  private def nullRow: InternalRow =
    new GenericInternalRow(Array[Any](null, null, null))

  private def parsePng(p: Array[Byte]): InternalRow =
    if (p.length >= 24 &&
      (p(0) & 0xFF) == 0x89 && p(1) == 'P' && p(2) == 'N' && p(3) == 'G' &&
      (p(4) & 0xFF) == 0x0D && (p(5) & 0xFF) == 0x0A &&
      (p(6) & 0xFF) == 0x1A && (p(7) & 0xFF) == 0x0A &&
      p(12) == 'I' && p(13) == 'H' && p(14) == 'D' && p(15) == 'R')
      row("png", be32(p, 16), be32(p, 20))
    else null

  private def parseJpeg(p: Array[Byte]): InternalRow = {
    if (p.length < 4 || (p(0) & 0xFF) != 0xFF || (p(1) & 0xFF) != 0xD8)
      return null
    var i = 2
    while (i + 1 < p.length) {
      if ((p(i) & 0xFF) != 0xFF) return null // lost segment sync: corrupt
      while (i + 1 < p.length && (p(i + 1) & 0xFF) == 0xFF) i += 1 // fill bytes
      if (i + 1 >= p.length) return null
      val marker = p(i + 1) & 0xFF
      i += 2
      if (marker == 0xD9) return null // EOI before any SOF
      else if (marker == 0x01 || (marker >= 0xD0 && marker <= 0xD7)) {
        // TEM / RSTn: standalone, no length — continue
      } else {
        if (i + 1 >= p.length) return null
        val segLen = be16(p, i)
        if (segLen < 2) return null
        val isSof = marker >= 0xC0 && marker <= 0xCF &&
          marker != 0xC4 && marker != 0xC8 && marker != 0xCC
        if (isSof) {
          // a legal SOF is >= 8 bytes (len 2 + precision 1 + h 2 + w 2 +
          // ncomponents 1); a shorter declared length means the dim
          // fields would be read from the NEXT segment's bytes — corrupt
          if (i + 6 >= p.length || segLen < 8) return null
          return row("jpeg", be16(p, i + 5), be16(p, i + 3))
        }
        i += segLen
      }
    }
    null
  }

  private def parseGif(p: Array[Byte]): InternalRow =
    if (p.length >= 10 && p(0) == 'G' && p(1) == 'I' && p(2) == 'F' &&
      p(3) == '8' && (p(4) == '7' || p(4) == '9') && p(5) == 'a')
      row("gif", le16(p, 6), le16(p, 8))
    else null

  def compute(payload: Array[Byte]): InternalRow = {
    val png = parsePng(payload)
    if (png != null) return png
    val jpg = parseJpeg(payload)
    if (jpg != null) return jpg
    val gif = parseGif(payload)
    if (gif != null) return gif
    nullRow
  }
}

/** struct(format, width, height) decoded from a binary image payload —
  * one codegen'd call per row into [[ImageDimsKernel.compute]]; all-null
  * struct for unparseable bytes.
  */
case class ImageDims(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a binary argument, got ${t.sql}")
  }
  override def dataType: DataType = ImageDimsKernel.Schema
  override def prettyName: String = "image_dims"

  override def nullSafeEval(p: Any): Any =
    ImageDimsKernel.compute(p.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ImageDimsKernel.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** WAV (RIFF) header decode — the audio twin of [[ImageDimsKernel]]:
  * `RIFF <size u32 LE> WAVE`, then chunks of `<id 4> <size u32 LE>
  * <data>`; the `fmt ` chunk carries audio_format(u16 LE),
  * channels(u16 LE), sample_rate(u32 LE), byte_rate(u32 LE),
  * block_align(u16 LE), bits_per_sample(u16 LE). The chunk WALK matters:
  * real files put LIST/INFO chunks before `fmt `. Garbage → null
  * struct, same tolerance contract as the image parser.
  */
object WavMetaKernel {

  val Schema: StructType = StructType(Seq(
    StructField("audio_format", IntegerType, nullable = true),
    StructField("channels", IntegerType, nullable = true),
    StructField("sample_rate", IntegerType, nullable = true),
    StructField("bits_per_sample", IntegerType, nullable = true)))

  private def le16(p: Array[Byte], i: Int): Int =
    (p(i) & 0xFF) | ((p(i + 1) & 0xFF) << 8)
  private def le32(p: Array[Byte], i: Int): Int =
    (p(i) & 0xFF) | ((p(i + 1) & 0xFF) << 8) |
      ((p(i + 2) & 0xFF) << 16) | ((p(i + 3) & 0xFF) << 24)
  private def tag(p: Array[Byte], i: Int, s: String): Boolean =
    p(i) == s.charAt(0).toByte && p(i + 1) == s.charAt(1).toByte &&
      p(i + 2) == s.charAt(2).toByte && p(i + 3) == s.charAt(3).toByte

  def compute(p: Array[Byte]): InternalRow = {
    val nulls = new GenericInternalRow(Array[Any](null, null, null, null))
    if (p.length < 12 || !tag(p, 0, "RIFF") || !tag(p, 8, "WAVE")) return nulls
    var i = 12
    while (i + 8 <= p.length) {
      val size = le32(p, i + 4)
      // negative = corrupt; > remaining bytes = corrupt AND (for multi-GB
      // payloads) the `i += 8 + size` advance could overflow Int into a
      // negative index — bound against the REMAINDER, not p.length, so
      // the advance below can never exceed p.length + 1 (pad byte)
      if (size < 0 || size > p.length - i - 8) return nulls
      if (tag(p, i, "fmt ")) {
        if (size < 16 || i + 8 + 16 > p.length) return nulls
        return new GenericInternalRow(Array[Any](
          le16(p, i + 8), le16(p, i + 10), le32(p, i + 12), le16(p, i + 22)))
      }
      i += 8 + size + (size & 1) // chunks are word-aligned (pad byte)
    }
    nulls
  }
}

/** struct(audio_format, channels, sample_rate, bits_per_sample) from a
  * binary WAV payload — one codegen'd call per row into
  * [[WavMetaKernel.compute]]; all-null struct for non-WAV bytes.
  */
case class WavMeta(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a binary argument, got ${t.sql}")
  }
  override def dataType: DataType = WavMetaKernel.Schema
  override def prettyName: String = "wav_meta"

  override def nullSafeEval(p: Any): Any =
    WavMetaKernel.compute(p.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WavMetaKernel.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ImageDimsFunctions {
  def imageDims(payload: Column): Column =
    Bridge.column(ImageDims(Bridge.expression(payload)))
  def wavMeta(payload: Column): Column =
    Bridge.column(WavMeta(Bridge.expression(payload)))
}
