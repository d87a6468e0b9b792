package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.ImageDimsFunctions.imageDims
import graft.sources.MediaColumns

/** Real container-header decode: byte fixtures written to the published
  * PNG/JPEG/GIF layouts (including a genuine, renderable 1x1 PNG), edge
  * cases (fill bytes, progressive SOF2, marker walking over APP
  * segments), and garbage tolerance.
  */
class ImageDimsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def hx(s: String): Array[Byte] =
    s.replaceAll("\\s", "").grouped(2)
      .map(Integer.parseInt(_, 16).toByte).toArray

  // A complete, genuine 1x1 transparent PNG (the classic spacer pixel:
  // signature, IHDR, IDAT with a real zlib stream, IEND — decodable by
  // any PNG library).
  private val png1x1 = hx(
    "89504E470D0A1A0A0000000D4948445200000001000000010806000000 1F15C4 89" +
      "0000000A 49444154 789C63000100000500010D0A2DB4" +
      "0000000049454E44AE426082")

  private def dims(p: Array[Byte]): (String, Integer, Integer) = {
    val r = Seq(Tuple1(p)).toDF("payload")
      .select(imageDims(col("payload")).as("d"))
      .select("d.format", "d.width", "d.height").collect().head
    (r.getAs[String]("format"),
      if (r.isNullAt(1)) null else Int.box(r.getInt(1)),
      if (r.isNullAt(2)) null else Int.box(r.getInt(2)))
  }

  test("PNG: genuine 1x1 file and a larger IHDR decode to exact dims") {
    assert(dims(png1x1) === (("png", 1, 1)))
    // 640x480: width/height big-endian in IHDR
    val png = hx("89504E470D0A1A0A0000000D49484452" +
      "00000280 000001E0 0806000000")
    assert(dims(png) === (("png", 640, 480)))
  }

  test("JPEG: baseline SOF0 after APP0, progressive SOF2, fill bytes, RST") {
    // SOI, APP0 (JFIF, len 16), SOF0 len 11: precision 8, height 2, width 3
    val baseline = hx("FFD8 FFE0 0010 4A46494600010100000100010000" +
      "FFC0 000B 08 0002 0003 01012200 FFD9")
    assert(dims(baseline) === (("jpeg", 3, 2)))
    // progressive: SOF2 straight after SOI, height 5, width 7
    val progressive = hx("FFD8 FFC2 0011 08 0005 0007 03012200021101031101 FFD9")
    assert(dims(progressive) === (("jpeg", 7, 5)))
    // legal fill bytes before the marker byte
    val filled = hx("FFD8 FFFF FF C0 0011 08 0005 0007 03012200021101031101")
    assert(dims(filled) === (("jpeg", 7, 5)))
    // standalone TEM marker (no length) then SOF
    val withTem = hx("FFD8 FF01 FFC0 000B 08 0100 0200 010122000000")
    assert(dims(withTem) === (("jpeg", 512, 256)))
    // DHT (C4) must NOT be mistaken for a SOF: its payload here encodes
    // bytes that would read as dims if C4 were treated as a frame
    val dht = hx("FFD8 FFC4 000B 08 0009 0009 01012200 FFC0 000B 08 0004 0006 01012200")
    assert(dims(dht) === (("jpeg", 6, 4)))
  }

  test("GIF: 87a and 89a little-endian logical screen dims") {
    assert(dims(hx("474946383961 0A00 0500 F700 5B")) === (("gif", 10, 5)))
    // 300 = 0x012C little-endian: 2C 01
    assert(dims(hx("474946383761 2C01 9001 00")) === (("gif", 300, 400)))
  }

  test("garbage tolerance: truncated, corrupt, text, empty all yield nulls") {
    val junk: Seq[Array[Byte]] = Seq(
      Array.empty[Byte],
      "just some text bytes".getBytes("UTF-8"),
      hx("89504E470D0A1A0A00000009"), // PNG sig but truncated before IHDR
      hx("FFD8"), // bare SOI
      hx("FFD8 FFE0 0010 4A46"), // APP0 length runs past the payload
      hx("FFD8 FFD9"), // EOI before any SOF
      hx("FFD8 00 C0"), // lost sync (no FF)
      hx("474946383561 0A00 0500") // GIF85a is not a version
    )
    junk.foreach { p =>
      assert(dims(p) === ((null, null, null)), s"payload ${p.length} bytes")
    }
  }

  test("corrupt headers with valid signatures null out, not garbage dims") {
    import graft.functions.WavMetaKernel
    // JPEG SOF whose declared length (5) is shorter than the dim fields:
    // reading height/width would pull bytes from the NEXT segment
    assert(dims(hx("FFD8 FFC0 0005 08 0002 0003 FFD9")) === ((null, null, null)))
    // PNG IHDR with a >2^31 width (reads negative through be32) and a
    // zero height: both non-positive -> nulls, never garbage geometry
    assert(dims(hx("89504E470D0A1A0A0000000D49484452" +
      "80000001 000001E0 0806000000")) === ((null, null, null)))
    assert(dims(hx("89504E470D0A1A0A0000000D49484452" +
      "00000280 00000000 0806000000")) === ((null, null, null)))
    // GIF with a zero logical-screen width
    assert(dims(hx("474946383961 0000 0500 F700 5B")) === ((null, null, null)))
    // WAV chunk whose size exceeds the REMAINING bytes (but not the total
    // payload length — the pre-r8 guard passed this; at multi-GB payload
    // sizes the i += 8 + size advance would overflow Int)
    def wavNull(p: Array[Byte]): Boolean = {
      val r = WavMetaKernel.compute(p)
      (0 until 4).forall(r.isNullAt)
    }
    assert(wavNull(hx("52494646 5C000000 57415645" +
      "4C495354 32000000 494E464F" + "00" * 16 + // size 0x32=50 > 44 left
      "666D7420 10000000 0100 0100 401F0000 401F0000 0100 0800")))
  }

  test("withImageDims attaches real dims over the media corpus frame") {
    val media = Seq(
      (1L, "image", png1x1),
      (2L, "image", "not an image".getBytes("UTF-8"))
    ).toDF("doc_id", "media_type", "payload")
    val out = MediaColumns.withImageDims(media)
      .select("doc_id", "img_format", "img_width", "img_height")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[String]("img_format") === "png")
    assert(out(1L).getAs[Int]("img_width") === 1)
    assert(out(2L).isNullAt(1) && out(2L).isNullAt(2) && out(2L).isNullAt(3))
  }

  test("wav_meta: canonical 44-byte header, chunk walk over LIST, garbage") {
    import graft.functions.ImageDimsFunctions.wavMeta
    def wav(p: Array[Byte]): (Integer, Integer, Integer, Integer) = {
      val r = Seq(Tuple1(p)).toDF("payload")
        .select(wavMeta(col("payload")).as("m"))
        .select("m.audio_format", "m.channels", "m.sample_rate",
          "m.bits_per_sample").collect().head
      def g(i: Int): Integer = if (r.isNullAt(i)) null else Int.box(r.getInt(i))
      (g(0), g(1), g(2), g(3))
    }
    // the canonical PCM header: mono, 8000 Hz (0x1F40), 8-bit
    val canonical = hx("52494646 24000000 57415645 666D7420 10000000" +
      "0100 0100 401F0000 401F0000 0100 0800 64617461 00000000")
    assert(wav(canonical) === ((1, 1, 8000, 8)))
    // LIST chunk (odd size 5 -> word-aligned pad byte) BEFORE fmt:
    // the walk must skip it, not misread its data as fmt fields
    val listFirst = hx("52494646 30000000 57415645" +
      "4C495354 05000000 494E464F 41 00" + // 'LIST' size 5 'INFO' 'A' + pad
      "666D7420 10000000 0100 0200 80BB0000 00000000 0000 1000")
    assert(wav(listFirst) === ((1, 2, 48000, 16)))
    // garbage: not RIFF, RIFF-but-not-WAVE, truncated fmt, no fmt chunk
    assert(wav("plain text".getBytes("UTF-8")) === ((null, null, null, null)))
    assert(wav(hx("52494646 24000000 41564920")) === ((null, null, null, null)))
    assert(wav(hx("52494646 24000000 57415645 666D7420 10000000 0100 0100"))
      === ((null, null, null, null)))
    assert(wav(hx("52494646 24000000 57415645 64617461 04000000 AABBCCDD"))
      === ((null, null, null, null)))
  }

  test("fuzz: random and truncated-real payloads never throw, only null out") {
    val rnd = new scala.util.Random(41)
    import graft.functions.{ImageDimsKernel, WavMetaKernel}
    // pure-kernel fuzz (no Spark job per case): 2000 random blobs + every
    // prefix of the real fixtures (truncation at each byte boundary) —
    // the decode contract is "garbage in, nulls out", never an exception
    val fixtures = Seq(png1x1,
      hx("FFD8FFE000104A46494600010100000100010000FFC0000B080002000301012200FFD9"),
      hx("474946383961 0A00 0500 F7005B"),
      hx("52494646 24000000 57415645 666D7420 10000000" +
        "0100 0100 401F0000 401F0000 0100 0800 64617461 00000000"))
    val cases =
      (1 to 2000).map(_ => Array.fill(rnd.nextInt(64))(rnd.nextInt(256).toByte)) ++
      fixtures.flatMap(f => (0 to f.length).map(f.take)) ++
      // adversarial walks: huge segment lengths, zero lengths, FF runs,
      // and a WAV chunk size crafted to overflow the `i += 8 + size`
      // advance (0x7FFFFFF0) if taken at face value
      Seq(hx("FFD8FFE0FFFF"), hx("FFD8FFC000"), hx("FFD8" + "FF" * 40),
        hx("FFD8FFE00000FFC0000B0800020003"),
        hx("52494646 24000000 57415645 4C495354 F0FFFF7F 00000000"))
    cases.foreach { p =>
      ImageDimsKernel.compute(p) // must not throw
      WavMetaKernel.compute(p)
    }
  }

  test("image_dims parses payloads built with relational byte construction") {
    // the contract-query construction path: big-endian hex via
    // lpad(hex(n)) + unhex — the parser must read back exactly
    val df = spark.range(1, 50).toDF("doc_id")
      .withColumn("w", (col("doc_id") % 37 + 100).cast("int"))
      .withColumn("h", (col("doc_id") % 23 + 50).cast("int"))
      .withColumn("payload", unhex(concat(
        lit("89504E470D0A1A0A0000000D49484452"),
        lpad(hex(col("w").cast("long")), 8, "0"),
        lpad(hex(col("h").cast("long")), 8, "0"),
        lit("0806000000"))))
      .select(col("doc_id"), col("w"), col("h"),
        imageDims(col("payload")).as("d"))
    assert(df.filter(col("d.format") =!= "png" ||
      col("d.width") =!= col("w") || col("d.height") =!= col("h")).count() === 0)
  }
}
