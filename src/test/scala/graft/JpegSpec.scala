package graft

import graft.operators.{Jpeg, Multimodal}

/** Pins for the baseline JPEG entropy decoder. The bitstream fixtures
  * are HAND-PACKED (huffman codes, magnitude bits and byte padding
  * derived on paper from T.81 F.1.2/F.2.2), so the decoder is verified
  * against the spec's bit layout independently of [[Jpeg.encodeJpeg]];
  * the encoder is then pinned by exact round-trip. */
class JpegSpec extends SparkSpec {

  private def seg(m: Int, data: Seq[Int]): Seq[Int] =
    Seq(0xff, m, (data.length + 2) >> 8, (data.length + 2) & 0xff) ++ data
  private def bytes(xs: Seq[Int]): Array[Byte] = xs.map(_.toByte).toArray

  // shared hand-built header pieces: all-ones DQT, flat 4-bit DC table
  private val dqt = seg(0xdb, Seq(0x00) ++ Seq.fill(64)(1))
  private val dhtDc = seg(0xc4,
    Seq(0x00) ++ Seq(0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0) ++ (0 to 11))

  test("hand-packed DC-only grayscale block decodes to the constant value") {
    // 8x8 gray, single block of 130: DC = 8*(130-128) = 16, diff 16 →
    // category 5 (code 0101 in the flat table) + bits 10000, then EOB
    // ('0' in a 1-bit AC table). Packed: 0101 10000 0 + 1-padding =
    // 0x58 0x3F — derived by hand.
    val dhtAc = seg(0xc4, Seq(0x10) ++ Seq(1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0) ++ Seq(0x00))
    val sof = seg(0xc0, Seq(8, 0, 8, 0, 8, 1, 1, 0x11, 0))
    val sos = seg(0xda, Seq(1, 1, 0x00, 0, 63, 0))
    val jpeg = bytes(Seq(0xff, 0xd8) ++ dqt ++ dhtDc ++ dhtAc ++ sof ++ sos ++
      Seq(0x58, 0x3f, 0xff, 0xd9))
    val Some(d) = Jpeg.decode(jpeg)
    assert((d.width, d.height, d.planes.length) == ((8, 8, 1)))
    assert(d.planes(0).forall(_ == 130), s"got ${d.planes(0).take(8).toSeq}")
  }

  test("hand-packed AC coefficient: run/size decode, negative EXTEND, dequantize, IDCT") {
    // AC table: BITS [0,2,1,...] → codes 00=EOB, 01=(run0,size1),
    // 100=(run1,size1). Quant table is all 1s except zigzag index 2
    // (raster 8 = vertical frequency v=1), set to 3.
    // Scan for one 8x8 gray block: DC category 0 ('0000'), then
    // (run1,size1) '100' skipping one zero to k=2, magnitude bit '0' →
    // EXTEND(0,1) = −1 → coefficient −1·3 = −3 at F(u=0,v=1), then EOB
    // '00'. Packed: 0000 100 0 00 + 1-padding = 0x08 0x3F.
    // IDCT of that single coefficient: f(x,y) = (−3/(4√2))·cos((2y+1)π/16)
    // → y=0 row rounds to −1, y=7 row to +1, middle rows to 0; +128.
    val q = Seq(0x00) ++ Seq.tabulate(64)(k => if (k == 2) 3 else 1)
    val dhtAc = seg(0xc4,
      Seq(0x10) ++ Seq(0, 2, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0) ++ Seq(0x00, 0x01, 0x11))
    val sof = seg(0xc0, Seq(8, 0, 8, 0, 8, 1, 1, 0x11, 0))
    val sos = seg(0xda, Seq(1, 1, 0x00, 0, 63, 0))
    val jpeg = bytes(Seq(0xff, 0xd8) ++ seg(0xdb, q) ++ dhtDc ++ dhtAc ++ sof ++ sos ++
      Seq(0x08, 0x3f, 0xff, 0xd9))
    val Some(d) = Jpeg.decode(jpeg)
    assert((d.width, d.height) == ((8, 8)))
    for (y <- 0 until 8; x <- 0 until 8) {
      val expect = y match { case 0 => 127; case 7 => 129; case _ => 128 }
      assert(d.planes(0)(y * 8 + x) == expect, s"pixel ($x,$y)")
    }
  }

  test("hand-packed ZRL: 16-zero run crosses into the high zigzag indices") {
    // AC table: BITS [0,2,2,...] → 00=EOB, 01=(0,1), 100=(1,1), 101=ZRL.
    // Scan: DC cat 0 '0000', ZRL '101' (k 1→17), (run1,size1) '100' +
    // bit '1' → +1 at zigzag k=18 (raster 26: u=2, v=3), EOB '00'.
    // Packed: 0000 101 100 1 00 + 1-padding = 0x0B 0x27 → wait, by hand:
    // 000010110 0100 → bits 0000 1011 0010 0 + 111 = 0x0B 0x27. The
    // assertion below does not trust this comment: expected pixels are
    // computed from the IDCT definition written out inline.
    val dhtAc = seg(0xc4,
      Seq(0x10) ++ Seq(0, 2, 2, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0) ++
        Seq(0x00, 0x01, 0x11, 0xf0))
    val sof = seg(0xc0, Seq(8, 0, 8, 0, 8, 1, 1, 0x11, 0))
    val sos = seg(0xda, Seq(1, 1, 0x00, 0, 63, 0))
    val jpeg = bytes(Seq(0xff, 0xd8) ++ dqt ++ dhtDc ++ dhtAc ++ sof ++ sos ++
      Seq(0x0b, 0x27, 0xff, 0xd9))
    val Some(d) = Jpeg.decode(jpeg)
    // independent IDCT of a single +1 coefficient at u=2, v=3
    def c(u: Int) = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
    for (y <- 0 until 8; x <- 0 until 8) {
      val v = c(2) * c(3) * math.cos((2 * x + 1) * 2 * math.Pi / 16.0) *
        math.cos((2 * y + 1) * 3 * math.Pi / 16.0) / 4.0
      val expect = math.round(v).toInt + 128
      assert(d.planes(0)(y * 8 + x) == expect, s"pixel ($x,$y)")
    }
  }

  test("encoder round-trip is integer-exact on constant tiles (gray and 4:4:4)") {
    val gray = Jpeg.encodeJpeg(16, 8, 1, (bx, by, _) => 40 + bx * 50 + by)
    val Some(g) = Jpeg.decode(gray)
    assert((g.width, g.height, g.planes.length) == ((16, 8, 1)))
    for (y <- 0 until 8; x <- 0 until 16)
      assert(g.planes(0)(y * 16 + x) == 40 + (x / 8) * 50)
    val color = Jpeg.encodeJpeg(24, 16, 3,
      (bx, by, c) => Multimodal.jpegPixelValue(9L, bx, by, c))
    val Some(d) = Jpeg.decode(color)
    assert(d.planes.length == 3)
    for (y <- 0 until 16; x <- 0 until 24; c <- 0 until 3)
      assert(d.planes(c)(y * 24 + x) == Multimodal.jpegPixelValue(9L, x / 8, y / 8, c),
        s"($x,$y,$c)")
    // byte-stuffing path: some DC magnitudes produce 0xFF scan bytes —
    // sweep every constant value to force one through
    for (v <- 0 until 256 by 17) {
      val Some(one) = Jpeg.decode(Jpeg.encodeJpeg(8, 8, 1, (_, _, _) => v))
      assert(one.planes(0).forall(_ == v), s"constant $v")
    }
  }

  test("out-of-scope and malformed streams are rejected, not misdecoded") {
    val ok = Jpeg.encodeJpeg(8, 8, 1, (_, _, _) => 100)
    assert(Jpeg.decode(ok).isDefined)
    // progressive frame marker
    val prog = ok.clone()
    val sofAt = ok.indices.find(i => (ok(i) & 0xff) == 0xff && (ok(i + 1) & 0xff) == 0xc0).get
    prog(sofAt + 1) = 0xc2.toByte
    assert(Jpeg.decode(prog).isEmpty)
    // 2x1 sampling factors
    val sub = ok.clone(); sub(sofAt + 11) = 0x21.toByte
    assert(Jpeg.decode(sub).isEmpty)
    // truncated entropy data
    assert(Jpeg.decode(ok.dropRight(3)).isEmpty)
    // not a JPEG
    assert(Jpeg.decode("plainly not an image".getBytes).isEmpty)
    // truncated SOF segment: len passes the whole-segment bound but is
    // too short for its own fields — must return None, not throw
    assert(Jpeg.decode(bytes(Seq(0xff, 0xd8, 0xff, 0xc0, 0x00, 0x02))).isEmpty)
    assert(Jpeg.decode(bytes(Seq(0xff, 0xd8) ++ dqt ++ dhtDc ++
      seg(0xc0, Seq(8, 0, 8, 0, 8, 3, 1, 0x11, 0)))).isEmpty) // nc=3, 1 comp listed
    // SOS selectors reordered vs the frame header: tables/planes are
    // bound by position, so a reordered scan must be REJECTED, not
    // misdecoded with swapped quant tables
    val color = Jpeg.encodeJpeg(8, 8, 3, (_, _, c) => 50 + c)
    assert(Jpeg.decode(color).isDefined)
    val sosAt = color.indices.find(i =>
      (color(i) & 0xff) == 0xff && (color(i + 1) & 0xff) == 0xda).get
    val swapped = color.clone()
    swapped(sosAt + 5) = 3; swapped(sosAt + 9) = 1 // selectors 3,2,1
    assert(Jpeg.decode(swapped).isEmpty)
    // SOS selector list longer than its segment: None, not a crash
    assert(Jpeg.decode(bytes(Seq(0xff, 0xd8) ++ dqt ++ dhtDc ++
      seg(0xc0, Seq(8, 0, 8, 0, 8, 1, 1, 0x11, 0)) ++
      seg(0xda, Seq(1)))).isEmpty)
  }

  test("ZRL run crossing coefficient 63 is rejected, landing exactly on it is not") {
    // AC table: l2 codes 00=EOB, 01=(0,1); l3 codes 100=(1,1), 101=ZRL,
    // 110=(run14,size1)
    val dhtAc = seg(0xc4,
      Seq(0x10) ++ Seq(0, 2, 3, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0) ++
        Seq(0x00, 0x01, 0x11, 0xf0, 0xe1))
    val sof = seg(0xc0, Seq(8, 0, 8, 0, 8, 1, 1, 0x11, 0))
    val sos = seg(0xda, Seq(1, 1, 0x00, 0, 63, 0))
    def jpegWithScan(scan: Seq[Int]) = bytes(
      Seq(0xff, 0xd8) ++ dqt ++ dhtDc ++ dhtAc ++ sof ++ sos ++ scan ++ Seq(0xff, 0xd9))
    // DC cat 0 + FOUR ZRLs: k 1→17→33→49→65 crosses 63 → invalid.
    // Packed: 0000 101 101 101 101 = 0x0B 0x6D (16 bits exactly).
    assert(Jpeg.decode(jpegWithScan(Seq(0x0b, 0x6d))).isEmpty)
    // DC cat 0 + THREE ZRLs (k → 49) + (run14,size1)+bit '1': 14 zeros
    // then the coefficient at k=63 → k=64 exactly, block complete
    // without EOB — valid. Packed: 0000 101 101 101 110 1 + 1111111 pad
    // = 0x0B 0x6E 0xFF (stuffed 0x00).
    val Some(d) = Jpeg.decode(jpegWithScan(Seq(0x0b, 0x6e, 0xff, 0x00)))
    assert(d.width == 8 && d.height == 8)
  }
}
