package graft

import graft.functions.Mp4MetaKernel
import org.scalatest.funsuite.AnyFunSuite

class Mp4MetaSpec extends AnyFunSuite {

  private def hx(s: String): Array[Byte] =
    s.replaceAll("\\s", "").grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  private def parse(p: Array[Byte]): Option[(String, Int, Long, Int)] = {
    val r = Mp4MetaKernel.compute(p)
    if (r.isNullAt(0) && r.isNullAt(1)) None
    else Some((r.getUTF8String(0).toString, r.getInt(1), r.getLong(2),
      r.getInt(3)))
  }

  private val ftyp = "00000010 66747970 69736F6D 00000200"
  // mvhd v0: timescale 600, duration 3000 (5 s)
  private val mvhdV0 =
    "0000001C 6D766864 00000000 00000000 00000000 00000258 00000BB8"
  private val trak = "00000008 7472616B"

  test("canonical v0 file: brand, timescale, duration, track count") {
    val moov = "00000034 6D6F6F76" + mvhdV0 + trak + trak // 8+28+16 = 52
    assert(parse(hx(ftyp + moov)) == Some(("isom", 600, 3000L, 2)))
  }

  test("mvhd version 1 carries 64-bit duration") {
    // v1: creation/modification u64, timescale 1000, duration 2^32+5
    val mvhdV1 = "00000028 6D766864 01000000" + "00" * 16 +
      "000003E8" + "00000001 00000005"
    val moov = "00000038 6D6F6F76" + mvhdV1 + trak // 8+40+8 = 56
    assert(parse(hx(ftyp + moov)) ==
      Some(("isom", 1000, (1L << 32) + 5L, 1)))
  }

  test("free/skip boxes and mvhd-after-trak ordering are walked, not assumed") {
    val free = "00000008 66726565"
    val moov = "00000034 6D6F6F76" + trak + trak + mvhdV0 // children reordered
    assert(parse(hx(ftyp + free + moov + free)) == Some(("isom", 600, 3000L, 2)))
  }

  test("largesize (size == 1) and size == 0 (to EOF) boxes") {
    // moov with a 16-byte largesize header: total 16+28 = 44 = 0x2C
    val moovLarge = "00000001 6D6F6F76 00000000 0000002C" + mvhdV0
    assert(parse(hx(ftyp + moovLarge)) == Some(("isom", 600, 3000L, 0)))
    // last top-level box declares size 0 → runs to EOF
    val moovZero = "00000000 6D6F6F76" + mvhdV0 + trak
    assert(parse(hx(ftyp + moovZero)) == Some(("isom", 600, 3000L, 1)))
  }

  test("garbage tolerance: every malformed shape yields null, never a throw") {
    val moov = "00000024 6D6F6F76" + mvhdV0 + trak
    val cases = Seq(
      Array.empty[Byte],
      hx("00"),
      hx(ftyp), // no moov
      hx(moov), // no ftyp (magic requirement)
      hx(ftyp + moov).dropRight(3), // truncated mid-box
      hx("FFFFFFFF 66747970 69736F6D 00000200" + moov), // size > file
      hx("00000004 66747970" + moov), // size < header
      hx(ftyp + "00000024 6D6F6F76" +
        "0000001C 6D766864 02000000 00000000 00000000 00000258 00000BB8"),
      // ^ mvhd version 2 does not exist
      hx(ftyp + "00000024 6D6F6F76" +
        "0000001C 6D766864 00000000 00000000 00000000 00000000 00000BB8"),
      // ^ zero timescale
      hx(ftyp + "00000010 6D6F6F76 00000008 6D766864"),
      // ^ header-only mvhd (no version/flags word) with moov ending at
      //   EOF: reading the version byte would index past the payload
      "not an mp4 at all, just some text".getBytes("UTF-8"))
    cases.foreach(p => assert(parse(p).isEmpty, p.length))
  }

  test("fuzz: arbitrary byte soup never throws") {
    val rnd = new scala.util.Random(41)
    for (len <- Seq(0, 1, 7, 8, 15, 16, 64, 256, 4096); _ <- 1 to 50) {
      val p = new Array[Byte](len)
      rnd.nextBytes(p)
      Mp4MetaKernel.compute(p) // must not throw
    }
    // adversarial: valid ftyp followed by random bytes
    for (_ <- 1 to 200) {
      val tail = new Array[Byte](rnd.nextInt(128))
      rnd.nextBytes(tail)
      Mp4MetaKernel.compute(hx(ftyp) ++ tail)
    }
  }
}
