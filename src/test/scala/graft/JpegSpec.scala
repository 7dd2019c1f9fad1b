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
    // SOF patched to progressive over a BASELINE scan header: the
    // sequential (0,63) band is illegal in a progressive scan (DC
    // scans are the band (0,0)) — rejected, not misdecoded
    val prog = ok.clone()
    val sofAt = ok.indices.find(i => (ok(i) & 0xff) == 0xff && (ok(i + 1) & 0xff) == 0xc0).get
    prog(sofAt + 1) = 0xc2.toByte
    assert(Jpeg.decode(prog).isEmpty)
    // declared 2x1 sampling on a SINGLE-component frame: per A.2.2 a
    // one-component scan is non-interleaved and sampling is ignored, so
    // this must DECODE (it used to be rejected under the 4:4:4-only
    // scope), identically to the 1x1 stream
    val sub = ok.clone(); sub(sofAt + 11) = 0x21.toByte
    val Some(subD) = Jpeg.decode(sub)
    assert(subD.planes(0).forall(_ == 100))
    // sampling factor outside {1,2} (4x1): out of scope, rejected
    val s41 = ok.clone(); s41(sofAt + 11) = 0x41.toByte
    assert(Jpeg.decode(s41).isEmpty)
    // SOF0 quant-table id past the 4-table baseline range: must REJECT
    // at parse time, not AIOOBE inside decodeScan
    val badQ = ok.clone(); badQ(sofAt + 12) = 0xfe.toByte
    assert(Jpeg.decode(badQ).isEmpty)
    // SOS huffman-table selector nibbles past the 4-table range: same
    // reject-don't-throw contract (td=4 / ta=4 would index dcTab(4))
    val grayScanAt = ok.indices.find(i =>
      (ok(i) & 0xff) == 0xff && (ok(i + 1) & 0xff) == 0xda).get
    val badTd = ok.clone(); badTd(grayScanAt + 6) = 0x40.toByte
    assert(Jpeg.decode(badTd).isEmpty)
    val badTa = ok.clone(); badTa(grayScanAt + 6) = 0x04.toByte
    assert(Jpeg.decode(badTa).isEmpty)
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

  // bit-string → padded bytes, for fixtures whose huffman codes and
  // magnitude bits are derived on paper but whose byte packing is long
  // enough that hand-packing would be the error source
  private def pack(bits: String): Seq[Int] = {
    val s = bits.replace(" ", "")
    val padded = s + "1" * ((8 - s.length % 8) % 8)
    padded.grouped(8).map(Integer.parseInt(_, 2)).toSeq
  }

  test("hand-packed 4:2:0 MCU: Y 2x2 + chroma, interleave order and replication upsampling") {
    // 16x16, one MCU = 4 Y blocks (2x2 raster) + Cb + Cr. Flat DC table
    // (category s = code s at 4 bits), 1-bit EOB AC table, all-ones DQT.
    // Y quadrants 130/132/134/136 → DCs 16/32/48/64, per-component
    // predictor → diffs all 16 (cat 5, bits 10000).
    // Cb 140 → DC 96, diff 96 (cat 7, bits 1100000).
    // Cr 120 → DC −64, diff −64 (cat 7, bits −64+127 = 63 = 0111111).
    val dhtAc = seg(0xc4, Seq(0x10) ++ Seq(1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0) ++ Seq(0x00))
    val sof = seg(0xc0, Seq(8, 0, 16, 0, 16, 3, 1, 0x22, 0, 2, 0x11, 0, 3, 0x11, 0))
    val sos = seg(0xda, Seq(3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0))
    val scan = pack("0101 10000 0 " * 4 + "0111 1100000 0 " + "0111 0111111 0")
    val jpeg = bytes(Seq(0xff, 0xd8) ++ dqt ++ dhtDc ++ dhtAc ++ sof ++ sos ++
      scan ++ Seq(0xff, 0xd9))
    val Some(d) = Jpeg.decode(jpeg)
    assert((d.width, d.height, d.planes.length) == ((16, 16, 3)))
    for (y <- 0 until 16; x <- 0 until 16) {
      val expectY = 130 + 2 * ((y / 8) * 2 + x / 8) // raster block order
      assert(d.planes(0)(y * 16 + x) == expectY, s"Y ($x,$y)")
      assert(d.planes(1)(y * 16 + x) == 140, s"Cb ($x,$y)")
      assert(d.planes(2)(y * 16 + x) == 120, s"Cr ($x,$y)")
    }
  }

  test("hand-packed 4:2:2 MCU: 2x1 Y sampling, horizontal-only chroma replication") {
    // 16x8, one MCU = 2 Y blocks (bx 0,1) + Cb + Cr; chroma planes are
    // 8x8 (halved horizontally only). Y left 130 → diff +16 (cat 5),
    // Y right 132 → DC 32, diff again +16; Cb/Cr as in the 4:2:0 test.
    val dhtAc = seg(0xc4, Seq(0x10) ++ Seq(1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0) ++ Seq(0x00))
    val sof = seg(0xc0, Seq(8, 0, 8, 0, 16, 3, 1, 0x21, 0, 2, 0x11, 0, 3, 0x11, 0))
    val sos = seg(0xda, Seq(3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0))
    val scan = pack("0101 10000 0 " * 2 + "0111 1100000 0 " + "0111 0111111 0")
    val jpeg = bytes(Seq(0xff, 0xd8) ++ dqt ++ dhtDc ++ dhtAc ++ sof ++ sos ++
      scan ++ Seq(0xff, 0xd9))
    val Some(d) = Jpeg.decode(jpeg)
    assert((d.width, d.height, d.planes.length) == ((16, 8, 3)))
    for (y <- 0 until 8; x <- 0 until 16) {
      assert(d.planes(0)(y * 16 + x) == (if (x < 8) 130 else 132), s"Y ($x,$y)")
      assert(d.planes(1)(y * 16 + x) == 140, s"Cb ($x,$y)")
      assert(d.planes(2)(y * 16 + x) == 120, s"Cr ($x,$y)")
    }
  }

  test("hand-packed 4:4:0 MCU: 1x2 Y sampling, vertical-only chroma replication") {
    // 8x16, one MCU = 2 Y blocks (by 0,1) + Cb + Cr; chroma planes are
    // 8x8 (halved vertically only). Y top 130 → +16, Y bottom 132 →
    // diff +16 again; Cb/Cr as in the 4:2:0 test.
    val dhtAc = seg(0xc4, Seq(0x10) ++ Seq(1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0) ++ Seq(0x00))
    val sof = seg(0xc0, Seq(8, 0, 16, 0, 8, 3, 1, 0x12, 0, 2, 0x11, 0, 3, 0x11, 0))
    val sos = seg(0xda, Seq(3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0))
    val scan = pack("0101 10000 0 " * 2 + "0111 1100000 0 " + "0111 0111111 0")
    val jpeg = bytes(Seq(0xff, 0xd8) ++ dqt ++ dhtDc ++ dhtAc ++ sof ++ sos ++
      scan ++ Seq(0xff, 0xd9))
    val Some(d) = Jpeg.decode(jpeg)
    assert((d.width, d.height, d.planes.length) == ((8, 16, 3)))
    for (y <- 0 until 16; x <- 0 until 8) {
      assert(d.planes(0)(y * 8 + x) == (if (y < 8) 130 else 132), s"Y ($x,$y)")
      assert(d.planes(1)(y * 8 + x) == 140, s"Cb ($x,$y)")
      assert(d.planes(2)(y * 8 + x) == 120, s"Cr ($x,$y)")
    }
  }

  test("hand-packed DRI/RSTn: byte-aligned resync, DC predictor reset, sequence check") {
    // 8x24 grayscale, DRI = 1: three MCUs separated by RST0, RST1. Each
    // segment's DC diff is the block's FULL DC (predictor resets at each
    // marker): 130 → +16 (cat 5), 135 → +56 (cat 6, bits 111000),
    // 125 → −24 (cat 5, bits −24+31 = 7 = 00111).
    val dhtAc = seg(0xc4, Seq(0x10) ++ Seq(1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0) ++ Seq(0x00))
    val sof = seg(0xc0, Seq(8, 0, 24, 0, 8, 1, 1, 0x11, 0))
    val dri = seg(0xdd, Seq(0, 1))
    val sos = seg(0xda, Seq(1, 1, 0x00, 0, 63, 0))
    val jpeg = bytes(Seq(0xff, 0xd8) ++ dqt ++ dhtDc ++ dhtAc ++ sof ++ dri ++ sos ++
      pack("0101 10000 0") ++ Seq(0xff, 0xd0) ++
      pack("0110 111000 0") ++ Seq(0xff, 0xd1) ++
      pack("0101 00111 0") ++ Seq(0xff, 0xd9))
    val Some(d) = Jpeg.decode(jpeg)
    assert((d.width, d.height) == ((8, 24)))
    for (y <- 0 until 24; x <- 0 until 8) {
      val expect = if (y < 8) 130 else if (y < 16) 135 else 125
      assert(d.planes(0)(y * 8 + x) == expect, s"($x,$y)")
    }
    // out-of-sequence restart marker (RST3 where RST1 is due): a decoder
    // that ignored the modulo-8 sequence would silently resync across a
    // dropped interval — must reject
    val rst1At = jpeg.indices.find(i =>
      (jpeg(i) & 0xff) == 0xff && (jpeg(i + 1) & 0xff) == 0xd1).get
    val bad = jpeg.clone(); bad(rst1At + 1) = 0xd3.toByte
    assert(Jpeg.decode(bad).isEmpty)
    // missing restart marker entirely (entropy data runs through the
    // boundary): the expected-RSTn check must fail, not misdecode
    val noRst = bytes(Seq(0xff, 0xd8) ++ dqt ++ dhtDc ++ dhtAc ++ sof ++ dri ++ sos ++
      pack("0101 10000 0" + "0110 111000 0" + "0101 00111 0") ++ Seq(0xff, 0xd9))
    assert(Jpeg.decode(noRst).isEmpty)
  }

  test("4:2:0 + DRI encoder round-trip is integer-exact, including RST cycling past RST7") {
    // 32x64: 8 MCUs; interval 3 → RST after MCUs 3 and 6 — and a taller
    // variant with 18 MCUs crosses the RST0..7 → RST0 wraparound
    def tile(seed: Long)(bx: Int, by: Int, c: Int): Int =
      Multimodal.jpegPixelValue(seed, bx, by, c)
    for (ri <- Seq(0, 3)) {
      val enc = Jpeg.encodeJpeg420(32, 64, tile(5L), ri)
      val Some(d) = Jpeg.decode(enc)
      assert((d.width, d.height, d.planes.length) == ((32, 64, 3)))
      for (y <- 0 until 64; x <- 0 until 32) {
        assert(d.planes(0)(y * 32 + x) == tile(5L)(x / 8, y / 8, 0), s"Y ($x,$y) ri=$ri")
        assert(d.planes(1)(y * 32 + x) == tile(5L)(x / 16, y / 16, 1), s"Cb ($x,$y) ri=$ri")
        assert(d.planes(2)(y * 32 + x) == tile(5L)(x / 16, y / 16, 2), s"Cr ($x,$y) ri=$ri")
      }
    }
    val tall = Jpeg.encodeJpeg420(16, 16 * 18, tile(7L), 2) // 18 MCUs, 8 RSTs → wraps
    val Some(t) = Jpeg.decode(tall)
    for (y <- 0 until 16 * 18; x <- 0 until 16)
      assert(t.planes(0)(y * 16 + x) == tile(7L)(x / 8, y / 8, 0), s"tall Y ($x,$y)")
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

  test("deep canonical huffman tables: codes at lengths 2..13 and 16, and 16-bit exhaustion") {
    // real-world tables are DEEP (the standard AC tables put 125 codes
    // at length 16); the flat fixtures elsewhere never push the
    // mincode/maxcode walk past 4 bits. DC table: cats 0..11 at one
    // code per length 2..13 — canonical codes 00, 010, 0110, 01110, …
    // (each next = (prev+1)<<1, T.81 Annex C).
    val dcDeep = seg(0xc4, Seq(0x00) ++
      Seq(0, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0) ++ (0 to 11))
    // AC table: ONE code, EOB, at length 16 → '0000000000000000'
    val acDeep = seg(0xc4, Seq(0x10) ++
      Seq(0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1) ++ Seq(0x00))
    val sof = seg(0xc0, Seq(8, 0, 8, 0, 8, 1, 1, 0x11, 0))
    val sos = seg(0xda, Seq(1, 1, 0x00, 0, 63, 0))
    // dc for 130 = 16, cat 5 → its code sits at length 7 ('0111110':
    // cats map to lengths 2..13 in order) + bits '10000', then the
    // 16-zero EOB
    val scan = pack("0111110 10000 " + "0" * 16)
    val Some(d) = Jpeg.decode(bytes(Seq(0xff, 0xd8) ++ dqt ++ dcDeep ++ acDeep ++
      sof ++ sos ++ scan ++ Seq(0xff, 0xd9)))
    assert(d.planes(0).forall(_ == 130), s"got ${d.planes(0).take(4).toSeq}")
    // the DEEPEST DC code (cat 11, length 13 '0111111111110'): diff
    // 1024 → bits '10000000000' → dc 1024 → idct 128 → +128 clamps 255
    val scan11 = pack("0111111111110 10000000000 " + "0" * 16)
    val Some(d11) = Jpeg.decode(bytes(Seq(0xff, 0xd8) ++ dqt ++ dcDeep ++ acDeep ++
      sof ++ sos ++ scan11 ++ Seq(0xff, 0xd9)))
    assert(d11.planes(0).forall(_ == 255))
    // 16-bit exhaustion: alternating bits match NO code in the deep AC
    // table (and contain no 0xFF byte, so the reader stays alive and
    // the CANONICAL WALK itself must stop at length 16 and reject)
    val bad = pack("0111110 10000 " + "10" * 8)
    assert(Jpeg.decode(bytes(Seq(0xff, 0xd8) ++ dqt ++ dcDeep ++ acDeep ++
      sof ++ sos ++ bad ++ Seq(0xff, 0xd9))).isEmpty)
  }

  test("16-bit DQT (pq=1): big-endian entries parse and dequantize; pq>1 rejects") {
    val dhtAc = seg(0xc4,
      Seq(0x10) ++ Seq(1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0) ++ Seq(0x00))
    val sof = seg(0xc0, Seq(8, 0, 8, 0, 8, 1, 1, 0x11, 0))
    val sos = seg(0xda, Seq(1, 1, 0x00, 0, 63, 0))
    // same hand-packed scan as the DC-only fixture (dc raw value 16);
    // DQT entries are 16-BIT with DC quant = 256 (bytes 01 00 — a
    // byte-width or endianness mistake reads 1 or misaligns the table):
    // coefficient 16·256 = 4096 → idct 512 → +128 clamps to 255
    val dqt16 = seg(0xdb, Seq(0x10) ++ Seq(1, 0) ++
      (1 until 64).flatMap(_ => Seq(0, 1)))
    val jpeg = bytes(Seq(0xff, 0xd8) ++ dqt16 ++ dhtDc ++ dhtAc ++ sof ++ sos ++
      Seq(0x58, 0x3f, 0xff, 0xd9))
    val Some(d) = Jpeg.decode(jpeg)
    assert(d.planes(0).forall(_ == 255), s"got ${d.planes(0).take(4).toSeq}")
    // precision nibble past 1 is out of spec — reject
    val dqtBad = seg(0xdb, Seq(0x20) ++ Seq.fill(64)(1))
    assert(Jpeg.decode(bytes(Seq(0xff, 0xd8) ++ dqtBad ++ dhtDc ++ dhtAc ++
      sof ++ sos ++ Seq(0x58, 0x3f, 0xff, 0xd9))).isEmpty)
    // a 16-bit table truncated by its own segment length — reject
    val dqtShort = seg(0xdb, Seq(0x10) ++ Seq.fill(100)(1))
    assert(Jpeg.decode(bytes(Seq(0xff, 0xd8) ++ dqtShort ++ dhtDc ++ dhtAc ++
      sof ++ sos ++ Seq(0x58, 0x3f, 0xff, 0xd9))).isEmpty)
  }

  test("crafted-dims guard: a SOF claiming huge dimensions rejects before allocating") {
    val ok = Jpeg.encodeJpeg(8, 8, 1, (_, _, _) => 100)
    assert(Jpeg.decode(ok).isDefined) // the unpatched stream decodes
    val sofAt = ok.indices.find(i =>
      (ok(i) & 0xff) == 0xff && (ok(i + 1) & 0xff) == 0xc0).get
    // SOF layout: FF C0 len(2) prec h(2) w(2) — dims at sofAt+5..+8
    def withDims(h: Int, w: Int): Array[Byte] = {
      val p = ok.clone()
      p(sofAt + 5) = (h >> 8).toByte; p(sofAt + 6) = h.toByte
      p(sofAt + 7) = (w >> 8).toByte; p(sofAt + 8) = w.toByte
      p
    }
    // 65535×65535: w*h overflows Int (×8 planes would be multi-GB) —
    // must return None, not NegativeArraySizeException/OOM
    assert(Jpeg.decode(withDims(65535, 65535)).isEmpty)
    // just past MaxPixels (64 MP): 8200×8200 = 67.24M px > 2^26
    assert(8200L * 8200 > Jpeg.MaxPixels)
    assert(Jpeg.decode(withDims(8200, 8200)).isEmpty)
    // and the bound is not inverted: 8192×8192 sits exactly AT the cap
    assert(8192L * 8192 == Jpeg.MaxPixels)
  }

  test("blocks-vs-entropy guard: claimed blocks exceeding the payload reject; a real small file does not") {
    val ok = Jpeg.encodeJpeg(8, 8, 1, (_, _, _) => 100)
    val sofAt = ok.indices.find(i =>
      (ok(i) & 0xff) == 0xff && (ok(i + 1) & 0xff) == 0xc0).get
    // claim 48×48 (36 blocks → ≥9 entropy bytes at the 2-bit floor)
    // over a payload that carries ~2: structurally truncated, reject
    // BEFORE allocating the 48×48 planes
    val inflated = ok.clone()
    inflated(sofAt + 5) = 0; inflated(sofAt + 6) = 48
    inflated(sofAt + 7) = 0; inflated(sofAt + 8) = 48
    assert(Jpeg.decode(inflated).isEmpty)
    // red-green for the inequality direction (r13 verdict: a floor that
    // rejected LEGITIMATE small images would pass every other test): a
    // real 48×48 stream, whose constant tiles make it about as small as
    // a legal file gets, must still decode
    val real = Jpeg.encodeJpeg(48, 48, 1, (bx, by, _) => (10 + bx + by) % 256)
    val Some(d) = Jpeg.decode(real)
    assert(d.width == 48 && d.height == 48)
    assert(d.planes(0)(0) == 10)
  }

  test("progressive encoder round-trip is integer-exact (gray and 4:4:4, with and without DRI)") {
    // 9 scans each: DC first at Al=4 (real diffs), DC refine 3..0
    // (Al=4 reaches below the ×8 FDCT factor, so refined bits carry
    // data), AC first Al=1 + refine Al=0 per component (EOB runs)
    def px(bx: Int, by: Int, c: Int) = (7 + bx * 31 + by * 17 + c * 5) % 256
    for (ri <- Seq(0, 2); (w, h, nc) <- Seq((8, 8, 1), (24, 16, 3), (32, 24, 3))) {
      val bytes = Jpeg.encodeJpegProgressive(w, h, nc, px, restartInterval = ri)
      val Some(d) = Jpeg.decode(bytes)
      assert((d.width, d.height, d.planes.length) == ((w, h, nc)))
      for (c <- 0 until nc; y <- 0 until h; x <- 0 until w)
        assert(d.planes(c)(y * w + x) == px(x / 8, y / 8, c),
          s"ri=$ri ${w}x$h c=$c ($x,$y)")
    }
    // the SOF really is SOF2 (a silently-baseline encoder would make
    // this whole test vacuous)
    val b = Jpeg.encodeJpegProgressive(8, 8, 1, px)
    assert(b.indices.exists(i => (b(i) & 0xff) == 0xff && (b(i + 1) & 0xff) == 0xc2))
    assert(!b.indices.exists(i => (b(i) & 0xff) == 0xff && (b(i + 1) & 0xff) == 0xc0))
  }

  test("progressive 4:2:0: interleaved DC over MCU-padded grids + non-interleaved AC sub-grid") {
    // hand-built scans over a 16×16 4:2:0 frame (Y 2×2 ⇒ four Y blocks
    // + Cb + Cr per MCU; one MCU total). DC first Al=0 full precision,
    // AC bands empty via single EOBs — pins that interleaved DC block
    // order is Y00 Y10 Y01 Y11 Cb Cr and that chroma upsamples ×2.
    val dhtAc = seg(0xc4,
      Seq(0x10) ++ Seq(1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0) ++ Seq(0x00))
    val sof = seg(0xc2, Seq(8, 0, 16, 0, 16, 3, 1, 0x22, 0, 2, 0x11, 0, 3, 0x11, 0))
    // Y tiles 130,132,134,136 (raster), Cb 140, Cr 150 → dc = 8(v−128):
    // Y 16,32,48,64 diffs 16,16,16,16 (cat 5, bits 10000); predictors
    // are PER SCAN COMPONENT, so Cb dc 96 diffs from 0 (cat 7, bits
    // 1100000) and Cr dc 176 likewise (cat 8, bits 10110000).
    // flat DC table: cat s codes as s in 4 bits
    val dcScan = pack("0101 10000 " * 4 + "0111 1100000 " + "1000 10110000")
    // AC scans: one per component, each a single EOB ('0') per block —
    // Y has FOUR blocks in its own 2×2 non-interleaved grid, chroma one
    val acY = pack("0 0 0 0")
    val acC = pack("0")
    val jpeg = bytes(Seq(0xff, 0xd8) ++ dqt ++ dhtDc ++ dhtAc ++ sof ++
      seg(0xda, Seq(3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 0, 0x00)) ++ dcScan ++
      seg(0xda, Seq(1, 1, 0x00, 1, 63, 0x00)) ++ acY ++
      seg(0xda, Seq(1, 2, 0x00, 1, 63, 0x00)) ++ acC ++
      seg(0xda, Seq(1, 3, 0x00, 1, 63, 0x00)) ++ acC ++
      Seq(0xff, 0xd9))
    val Some(d) = Jpeg.decode(jpeg)
    assert((d.width, d.height) == ((16, 16)))
    for (y <- 0 until 16; x <- 0 until 16) {
      val expY = Seq(130, 132, 134, 136)((y / 8) * 2 + x / 8)
      assert(d.planes(0)(y * 16 + x) == expY, s"Y ($x,$y)")
      assert(d.planes(1)(y * 16 + x) == 140, s"Cb ($x,$y)")
      assert(d.planes(2)(y * 16 + x) == 150, s"Cr ($x,$y)")
    }
  }

  test("hand-packed AC refinement: correction bit on nonzero history + new ±1 coefficient") {
    // 8×8 gray. Scan 1: DC first Al=0 (dc=16, cat 5 '0101'+'10000').
    // Scan 2: AC first Ss=1..63 Al=1 — (r=0,s=1) code '01', positive
    // bit '1' → coef@z1 = +1<<1 = 2; then EOB '00'.
    // Scan 3: AC refine Ah=1 Al=0 — (r=0,s=1) '01' + sign '1'
    // (newVal=+1), then ONE correction bit '1' for the nonzero-history
    // z1 (2 → 3), newVal lands on z2; EOB '00' → eobrun covers the
    // rest (all zero: no correction bits).
    // AC table: length-2 codes 00=EOB, 01=(0,1).
    val dhtAc = seg(0xc4,
      Seq(0x10) ++ Seq(0, 2, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0) ++ Seq(0x00, 0x01))
    val sof = seg(0xc2, Seq(8, 0, 8, 0, 8, 1, 1, 0x11, 0))
    val jpeg = bytes(Seq(0xff, 0xd8) ++ dqt ++ dhtDc ++ dhtAc ++ sof ++
      seg(0xda, Seq(1, 1, 0x00, 0, 0, 0x00)) ++ pack("0101 10000") ++
      seg(0xda, Seq(1, 1, 0x00, 1, 63, 0x01)) ++ pack("01 1 00") ++
      seg(0xda, Seq(1, 1, 0x00, 1, 63, 0x10)) ++ pack("01 1 1 00") ++
      Seq(0xff, 0xd9))
    val Some(d) = Jpeg.decode(jpeg)
    // expected: coefficients z0=16, z1=3, z2=1 → raster f(0)=16, f(1)=3
    // (zigzag 1 → raster 1), f(8)=1 (zigzag 2 → raster 8); pixels via
    // the decoder's own (separately pinned) IDCT + level shift
    val f = new Array[Int](64)
    f(0) = 16; f(1) = 3; f(8) = 1
    val exp = Jpeg.idct8x8(f).map(v => math.max(0, math.min(255, v + 128)))
    assert(d.planes(0).toSeq == exp.toSeq)
  }

  test("malformed progressive streams reject: bad bands, AC-first file, band overrun") {
    val ok = Jpeg.encodeJpegProgressive(8, 8, 1, (_, _, _) => 100)
    assert(Jpeg.decode(ok).isDefined)
    val dhtAc = seg(0xc4,
      Seq(0x10) ++ Seq(0, 2, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0) ++ Seq(0x00, 0x01))
    val sof2 = seg(0xc2, Seq(8, 0, 8, 0, 8, 1, 1, 0x11, 0))
    def file(scans: Seq[Int]): Array[Byte] =
      bytes(Seq(0xff, 0xd8) ++ dqt ++ dhtDc ++ dhtAc ++ sof2 ++ scans ++ Seq(0xff, 0xd9))
    // DC band with Se > 0 — the (0, >0) band exists only in sequential
    assert(Jpeg.decode(file(
      seg(0xda, Seq(1, 1, 0x00, 0, 63, 0x00)) ++ pack("0101 10000"))).isEmpty)
    // first scan is an AC scan: DC-first (G.1.1.1.1) violated — also
    // the allocation guard's footing, so it must reject
    assert(Jpeg.decode(file(
      seg(0xda, Seq(1, 1, 0x00, 1, 63, 0x00)) ++ pack("00"))).isEmpty)
    // Ah ≠ Al + 1 in a refinement
    assert(Jpeg.decode(file(
      seg(0xda, Seq(1, 1, 0x00, 0, 0, 0x00)) ++ pack("0101 10000") ++
      seg(0xda, Seq(1, 1, 0x00, 0, 0, 0x31)) ++ pack("0"))).isEmpty)
    // AC first scan whose coefficient run crosses the band end:
    // Ss=62..63 band, (r=2,s=1) would land at 65 — needs a code for
    // rs=0x21: extend the table (length-2: 00=EOB, 01=(2,1))
    val dhtAc2 = seg(0xc4,
      Seq(0x10) ++ Seq(0, 2, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0) ++ Seq(0x00, 0x21))
    assert(Jpeg.decode(bytes(Seq(0xff, 0xd8) ++ dqt ++ dhtDc ++ dhtAc2 ++ sof2 ++
      seg(0xda, Seq(1, 1, 0x00, 0, 0, 0x00)) ++ pack("0101 10000") ++
      seg(0xda, Seq(1, 1, 0x00, 62, 63, 0x00)) ++ pack("01 1") ++
      Seq(0xff, 0xd9))).isEmpty)
    // truncated mid-scan: DC refinement promised but no EOI/marker data
    assert(Jpeg.decode(ok.dropRight(6)).isEmpty)
  }
}
