package graft.operators

/** Baseline JPEG (ITU-T T.81) entropy decode in pure JVM — the third
  * member of the real-pixel-decode family (BMP m06, PNG m07): huffman
  * scan decode with byte-stuffing removal, differential DC, run/size AC
  * with EOB/ZRL, dequantization, de-zigzag, the full 2-D IDCT and level
  * shift. Scope (honestly bounded, everything else returns None):
  * baseline sequential SOF0, 8-bit samples, single interleaved scan,
  * 1 or 3 components all with sampling factors 1×1 (grayscale or
  * 4:4:4 — no chroma upsampling path), no restart intervals, no
  * progressive/arithmetic coding. Output is the decoded component
  * planes (Y or Y/Cb/Cr) WITHOUT color conversion: the colorspace
  * transform is a consumer choice, and keeping the decoder's output in
  * coded space keeps the m08 oracle integer-exact.
  *
  * The sibling [[encodeJpeg]] writes spec-valid baseline files whose
  * blocks are CONSTANT per 8×8 tile with all-ones quantization tables:
  * a constant block's FDCT is DC-only (DC = 8·(v−128), every AC 0), so
  * quantization drops nothing and decode recovers every sample EXACTLY
  * — the property that makes a lossy codec oracle-checkable by formula.
  * The tables it declares are its own legal custom ones (DHT travels in
  * the file): a flat 4-bit DC table for categories 0–11 and a 1-bit
  * AC table holding only EOB. The DECODER is general — JpegSpec feeds
  * it hand-computed bitstreams with nonzero ACs, run lengths and both
  * table shapes, independent of the encoder. */
object Jpeg {

  // zigzag order: zigzag(k) = raster index of the k-th coefficient
  private[graft] val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** Canonical huffman table (T.81 Annex C): BITS counts per code
    * length 1..16 + the value list in code order. Decoding uses the
    * standard mincode/maxcode/valptr walk (F.2.2.3). */
  private[graft] final class HuffTable(bits: Array[Int], vals: Array[Int]) {
    require(bits.length == 16)
    private val minCode = new Array[Int](17)
    private val maxCode = new Array[Int](17) // -1 = no codes at this length
    private val valPtr = new Array[Int](17)
    locally {
      var code = 0
      var k = 0
      for (l <- 1 to 16) {
        valPtr(l) = k
        minCode(l) = code
        maxCode(l) = if (bits(l - 1) > 0) code + bits(l - 1) - 1 else -1
        code = (code + bits(l - 1)) << 1
        k += bits(l - 1)
      }
    }
    /** Decode one value from the bit reader; -1 on an invalid code. */
    def decode(in: BitReader): Int = {
      var code = 0
      var l = 0
      while (l < 16) {
        val b = in.readBit()
        if (b < 0) return -1
        code = (code << 1) | b
        l += 1
        if (maxCode(l) >= 0 && code <= maxCode(l) && code >= minCode(l))
          return vals(valPtr(l) + code - minCode(l))
      }
      -1
    }
  }

  /** MSB-first bit reader over entropy-coded data with 0xFF00
    * byte-stuffing removal (F.1.2.3); a 0xFF followed by anything else
    * is a marker — stop (returns -1 thereafter). */
  private[graft] final class BitReader(b: Array[Byte], start: Int) {
    private var pos = start
    private var cur = 0
    private var nBits = 0
    private var dead = false
    def readBit(): Int = {
      if (nBits == 0) {
        if (dead || pos >= b.length) return -1
        var byte = b(pos) & 0xff; pos += 1
        if (byte == 0xff) {
          if (pos >= b.length) { dead = true; return -1 }
          val next = b(pos) & 0xff
          if (next == 0x00) pos += 1 // stuffed zero: the data byte IS 0xFF
          else { dead = true; return -1 } // a real marker ends the scan
        }
        cur = byte; nBits = 8
      }
      nBits -= 1
      (cur >> nBits) & 1
    }
    /** `n` magnitude bits, MSB first; -1 on exhaustion (n ≤ 16). */
    def readBits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) {
        val b = readBit()
        if (b < 0) return -1
        v = (v << 1) | b
        i += 1
      }
      v
    }
  }

  /** DC/AC magnitude extension (F.2.2.1 EXTEND): a category-`s` value
    * with raw bits `v` is v itself when the first bit is 1, else
    * v − (2^s − 1). */
  private[graft] def extend(v: Int, s: Int): Int =
    if (s == 0) 0 else if (v >= (1 << (s - 1))) v else v - (1 << s) + 1

  // IDCT constants hoisted out of the per-block hot loop (the Zigzag
  // treatment): the scale vector and the 8×8 cosine table never change,
  // and rebuilding them cost 64 transcendental calls per decoded block
  private val IdctC: Array[Double] =
    Array.tabulate(8)(u => if (u == 0) 1.0 / math.sqrt(2.0) else 1.0)
  private val IdctCos: Array[Array[Double]] =
    Array.tabulate(8, 8)((x, u) => math.cos((2 * x + 1) * u * math.Pi / 16.0))

  /** 2-D 8×8 inverse DCT (T.81 A.3.3), separable double implementation,
    * rounded to nearest — exact on DC-only blocks (F(0,0)/8 is an
    * integer there). Input raster order, output raster order. */
  private[graft] def idct8x8(f: Array[Int]): Array[Int] = {
    val c = IdctC
    val cosT = IdctCos
    val out = new Array[Int](64)
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var u = 0
        while (u < 8) {
          var v = 0
          while (v < 8) {
            s += c(u) * c(v) * f(v * 8 + u) * cosT(x)(u) * cosT(y)(v)
            v += 1
          }
          u += 1
        }
        out(y * 8 + x) = math.round(s / 4.0).toInt
        x += 1
      }
      y += 1
    }
    out
  }

  /** Decoded image: component planes in coded space (level-shifted back
    * to [0,255], clamped), each `width`×`height`, raster order. 1 plane
    * for grayscale, 3 (Y, Cb, Cr) for 4:4:4 color. */
  final case class Decoded(width: Int, height: Int, planes: Array[Array[Int]])

  // marker-segment cursor helpers
  private def be16(b: Array[Byte], o: Int) = ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)

  /** Full baseline decode within the documented scope; None otherwise. */
  def decode(b: Array[Byte]): Option[Decoded] = {
    if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8) return None
    val quant = new Array[Array[Int]](4) // qtable id → 64 coefs (raster via zigzag later)
    val dcTab = new Array[HuffTable](4)
    val acTab = new Array[HuffTable](4)
    var w = 0; var h = 0
    // per component: (id, qtableId); scan maps component → (dc, ac) table ids
    var comps: Array[(Int, Int)] = null
    var o = 2
    while (o + 4 <= b.length) {
      if ((b(o) & 0xff) != 0xff) return None
      val m = b(o + 1) & 0xff
      if (m == 0xd8 || (m >= 0xd0 && m <= 0xd7) || m == 0x01) { o += 2 }
      else if (m == 0xd9) return None // EOI before any scan
      else {
        val len = be16(b, o + 2)
        if (o + 2 + len > b.length || len < 2) return None
        val seg = o + 4
        m match {
          case 0xdb => // DQT: one or more (precision/id, 64 coefs) entries
            var p = seg
            while (p < o + 2 + len) {
              val pq = (b(p) & 0xff) >> 4; val tq = b(p) & 0x0f
              if (pq != 0 || tq > 3 || p + 65 > o + 2 + len) return None
              quant(tq) = Array.tabulate(64)(k => b(p + 1 + k) & 0xff)
              p += 65
            }
          case 0xc4 => // DHT: one or more tables
            var p = seg
            while (p < o + 2 + len) {
              val tc = (b(p) & 0xff) >> 4; val th = b(p) & 0x0f
              if (tc > 1 || th > 3 || p + 17 > o + 2 + len) return None
              val bits = Array.tabulate(16)(i => b(p + 1 + i) & 0xff)
              val n = bits.sum
              if (p + 17 + n > o + 2 + len) return None
              val vals = Array.tabulate(n)(i => b(p + 17 + i) & 0xff)
              val t = new HuffTable(bits, vals)
              if (tc == 0) dcTab(th) = t else acTab(th) = t
              p += 17 + n
            }
          case 0xc0 => // SOF0 baseline
            if (len < 8) return None // 2 len + prec + h + w + nc minimum
            val prec = b(seg) & 0xff
            h = be16(b, seg + 1); w = be16(b, seg + 3)
            val nc = b(seg + 5) & 0xff
            if (prec != 8 || w <= 0 || h <= 0 || (nc != 1 && nc != 3)) return None
            if (len < 8 + 3 * nc) return None // truncated component list
            comps = Array.tabulate(nc) { i =>
              val cid = b(seg + 6 + 3 * i) & 0xff
              val hv = b(seg + 7 + 3 * i) & 0xff
              if (hv != 0x11) return None // 4:4:4 / grayscale only
              (cid, b(seg + 8 + 3 * i) & 0xff)
            }
          case 0xc1 | 0xc2 | 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca | 0xcb |
               0xcd | 0xce | 0xcf => return None // non-baseline frame
          case 0xdd => return None // restart intervals out of scope
          case 0xda => // SOS: header, then entropy data to EOI
            if (comps == null || len < 3) return None
            val ns = b(seg) & 0xff
            if (ns != comps.length) return None
            if (len < 2 + 1 + 2 * ns + 3) return None // truncated selector list
            val tabs = Array.tabulate(ns) { i =>
              val cs = b(seg + 1 + 2 * i) & 0xff
              val td = (b(seg + 2 + 2 * i) & 0xff) >> 4
              val ta = b(seg + 2 + 2 * i) & 0x0f
              // decodeScan binds table i to frame component i BY POSITION,
              // so the scan's selector order must BE the frame order (a
              // reordered or repeated selector would silently pair a
              // component with another's quant table and plane)
              if (cs != comps(i)._1) return None
              (td, ta)
            }
            return decodeScan(b, o + 2 + len, w, h, comps, tabs, quant, dcTab, acTab)
          case _ => () // APPn/COM/etc: skip
        }
        o += 2 + len
      }
    }
    None
  }

  private def decodeScan(b: Array[Byte], start: Int, w: Int, h: Int,
                         comps: Array[(Int, Int)], tabs: Array[(Int, Int)],
                         quant: Array[Array[Int]], dcTab: Array[HuffTable],
                         acTab: Array[HuffTable]): Option[Decoded] = {
    val nc = comps.length
    val planes = Array.fill(nc)(new Array[Int](w * h))
    val mcuW = (w + 7) / 8; val mcuH = (h + 7) / 8
    val in = new BitReader(b, start)
    val dcPred = new Array[Int](nc)
    var my = 0
    while (my < mcuH) {
      var mx = 0
      while (mx < mcuW) {
        var ci = 0
        while (ci < nc) {
          val (td, ta) = tabs(ci)
          val q = quant(comps(ci)._2)
          if (q == null || dcTab(td) == null || acTab(ta) == null) return None
          // DC
          val s = dcTab(td).decode(in)
          if (s < 0 || s > 11) return None
          val diffBits = if (s == 0) 0 else in.readBits(s)
          if (diffBits < 0) return None
          dcPred(ci) += extend(diffBits, s)
          val coef = new Array[Int](64)
          coef(0) = dcPred(ci) * q(0)
          // AC: run/size until EOB or coefficient 63
          var k = 1
          var done = false
          while (!done && k < 64) {
            val rs = acTab(ta).decode(in)
            if (rs < 0) return None
            val r = rs >> 4; val sz = rs & 0x0f
            if (sz == 0) {
              if (r == 15) {
                k += 16 // ZRL: sixteen zero coefficients
                // a run crossing past coefficient 63 is spec-invalid
                // (landing exactly on 64 is fine: the last 16 ACs were
                // zero and the block is complete) — the sz!=0 arm's
                // k > 63 guard, mirrored
                if (k > 64) return None
              }
              else done = true // EOB
            } else {
              k += r
              if (k > 63) return None
              val vb = in.readBits(sz)
              if (vb < 0) return None
              coef(Zigzag(k)) = extend(vb, sz) * q(k)
              k += 1
            }
          }
          val px = idct8x8(coef)
          // place block, clamping and level-shifting (+128)
          var yy = 0
          while (yy < 8) {
            val py = my * 8 + yy
            if (py < h) {
              var xx = 0
              while (xx < 8) {
                val pxx = mx * 8 + xx
                if (pxx < w) {
                  val v = px(yy * 8 + xx) + 128
                  planes(ci)(py * w + pxx) = if (v < 0) 0 else if (v > 255) 255 else v
                }
                xx += 1
              }
            }
            yy += 1
          }
          ci += 1
        }
        mx += 1
      }
      my += 1
    }
    Some(Decoded(w, h, planes))
  }

  // ---------- encoder (constant-block, integer-exact) ----------

  private final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var cur = 0
    private var n = 0
    def write(bits: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        cur = (cur << 1) | ((bits >> i) & 1)
        n += 1
        if (n == 8) {
          out.write(cur)
          if (cur == 0xff) out.write(0x00) // byte stuffing
          cur = 0; n = 0
        }
        i -= 1
      }
    }
    /** pad the final byte with 1s (F.1.2.3) and return the stream */
    def finish(): Array[Byte] = {
      if (n > 0) { cur = (cur << (8 - n)) | ((1 << (8 - n)) - 1); out.write(cur); if (cur == 0xff) out.write(0x00) }
      out.toByteArray
    }
  }

  private def dcCategory(v: Int): Int = {
    var s = 0; var a = math.abs(v)
    while (a > 0) { a >>= 1; s += 1 }
    s
  }

  /** Encode a baseline 4:4:4 (3-plane) or grayscale (1-plane) JPEG whose
    * 8×8 tiles are CONSTANT: `blockVal(bx, by, c)` gives tile (bx, by)'s
    * value for component c. Width/height must be multiples of 8. Writes
    * its own legal custom tables: all-ones DQT (lossless DC), a flat
    * 4-bit DC huffman table for categories 0–11, and a 1-bit AC table
    * holding only EOB. Decode through [[decode]] recovers every sample
    * exactly. */
  def encodeJpeg(w: Int, h: Int, nc: Int, blockVal: (Int, Int, Int) => Int): Array[Byte] = {
    require(w % 8 == 0 && h % 8 == 0 && (nc == 1 || nc == 3))
    val out = new java.io.ByteArrayOutputStream()
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    def segment(m: Int, data: Array[Int]): Unit = {
      marker(m); out.write((data.length + 2) >> 8); out.write((data.length + 2) & 0xff)
      data.foreach(out.write)
    }
    marker(0xd8) // SOI
    segment(0xdb, Array(0x00) ++ Array.fill(64)(1)) // DQT id 0, all ones
    // DHT: DC table 0 — twelve 4-bit codes for categories 0..11
    val dcBits = Array(0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
    segment(0xc4, Array(0x00) ++ dcBits ++ (0 to 11).toArray)
    // DHT: AC table 0 — a single 1-bit code for EOB (0x00)
    val acBits = Array(1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
    segment(0xc4, Array(0x10) ++ acBits ++ Array(0x00))
    // SOF0: components 1..nc, all 1×1 sampling, qtable 0
    segment(0xc0, Array(8, h >> 8, h & 0xff, w >> 8, w & 0xff, nc) ++
      (1 to nc).flatMap(c => Seq(c, 0x11, 0)).toArray)
    // SOS: every component uses DC table 0 / AC table 0
    segment(0xda, Array(nc) ++ (1 to nc).flatMap(c => Seq(c, 0x00)).toArray ++ Array(0, 63, 0))
    val bw = new BitWriter
    val dcPred = new Array[Int](nc)
    for (by <- 0 until h / 8; bx <- 0 until w / 8; c <- 0 until nc) {
      val v = blockVal(bx, by, c)
      require(v >= 0 && v <= 255)
      val dc = 8 * (v - 128) // FDCT of a constant block: DC only
      val diff = dc - dcPred(c)
      dcPred(c) = dc
      val s = dcCategory(diff)
      require(s <= 11)
      bw.write(s, 4) // flat DC table: category s has code s at length 4
      if (s > 0) {
        val bits = if (diff >= 0) diff else diff + (1 << s) - 1
        bw.write(bits, s)
      }
      bw.write(0, 1) // EOB ('0' in the 1-bit AC table)
    }
    out.write(bw.finish())
    marker(0xd9) // EOI
    out.toByteArray
  }
}
