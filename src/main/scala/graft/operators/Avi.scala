package graft.operators

/** Uncompressed AVI (RIFF 'AVI ') in pure JVM — the VIDEO member of the
  * real-decode family (BMP m06, PNG m07, JPEG m08, WAV m09): a real
  * container walk over the public RIFF/AVI layout (`hdrl` → `avih` main
  * header for dims + frame count, nested `strl` stream list whose
  * `strf` BITMAPINFOHEADER is VALIDATED, `movi` LIST holding one `00db`
  * chunk of raw bottom-up BGR DIB data per frame, with the same 4-byte
  * row alignment as a BMP pixel array). Frame extraction is an OFFSET
  * SEEK, not a decode-everything pass — exactly why video pipelines
  * sample frames before decoding (m03's index arithmetic, now against
  * real bytes).
  *
  * Scope (everything else None, never throw): single video stream,
  * 24-bpp BI_RGB frames in `00db` chunks — `00dc` (compressed) frames,
  * other depths, and per-frame chunks too short for the declared
  * dimensions are all rejected; the strf pixel format is checked, not
  * assumed. */
object Avi {

  private def le32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) | ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
  private def le16(b: Array[Byte], o: Int): Int = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def tag(b: Array[Byte], o: Int): String = new String(b, o, 4, "US-ASCII")

  /** Parsed container: dims + the byte offsets of each frame's DIB data
    * inside the buffer (frame i's pixel array = frames(i) ..
    * frames(i)+rowSize·h). */
  final case class AviIndex(width: Int, height: Int, nFrames: Int,
                            frameOffsets: Array[Int])

  /** Walk the container: returns the frame index without touching any
    * pixel data. */
  def parseAvi(b: Array[Byte]): Option[AviIndex] = {
    if (b.length < 24 || tag(b, 0) != "RIFF" || tag(b, 8) != "AVI ") return None
    var w = 0; var h = 0; var total = 0
    var bitCount = -1; var compression = -1
    val frames = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)] // (offset, declared len)
    // walk top-level chunks; descend into LIST('hdrl') for avih/strf and
    // LIST('movi') for frames
    def walk(from: Int, to: Int, inMovi: Boolean): Boolean = {
      var o = from
      while (o + 8 <= to) {
        val id = tag(b, o)
        val len = le32(b, o + 4)
        if (len < 0 || o.toLong + 8 + len > to) return false
        if (id == "LIST") {
          if (len < 4) return false
          val listType = tag(b, o + 8)
          if (!walk(o + 12, o + 8 + len, inMovi || listType == "movi")) return false
        } else if (id == "avih") {
          if (len < 40) return false
          total = le32(b, o + 8 + 16)
          w = le32(b, o + 8 + 32)
          h = le32(b, o + 8 + 36)
        } else if (id == "strf") {
          // the stream format IS a BITMAPINFOHEADER: enforce the scope
          // instead of assuming it (biBitCount @14, biCompression @16)
          if (len < 20) return false
          bitCount = le16(b, o + 8 + 14)
          compression = le32(b, o + 8 + 16)
        } else if (inMovi && id == "00db") {
          frames += ((o + 8, len))
        } else if (inMovi && id == "00dc") {
          return false // compressed frames are out of scope, not garbage
        }
        o += 8 + len + (len & 1) // RIFF word alignment
      }
      true
    }
    if (!walk(12, math.min(b.length, 8 + le32(b, 4)), inMovi = false)) return None
    if (w <= 0 || h <= 0 || frames.isEmpty) return None
    if (bitCount != 24 || compression != 0) return None // strf absent or non-BI_RGB-24
    if (w.toLong * h * 3 > Int.MaxValue) return None
    val rowSize = ((w.toLong * 3 + 3) / 4) * 4
    val frameBytes = rowSize * h
    // each frame's OWN declared chunk must hold a full pixel array — the
    // buffer length is not enough (a lying short chunk would otherwise
    // read the next chunk's header bytes as pixels)
    if (frames.exists { case (off, len) =>
      len < frameBytes || off.toLong + frameBytes > b.length }) return None
    if (total > 0 && total != frames.length) return None
    Some(AviIndex(w, h, frames.length, frames.map(_._1).toArray))
  }

  /** Decode ONE frame's pixels (image order, top row first, BGR) — the
    * shared DIB pixel-array walk ([[Multimodal.decodeDib]], the same
    * code the BMP decoder runs) applied at the frame's offset. */
  def decodeFrame(b: Array[Byte], idx: AviIndex, frame: Int): Option[Array[Int]] = {
    if (frame < 0 || frame >= idx.nFrames) return None
    Some(Multimodal.decodeDib(b, idx.frameOffsets(frame), idx.width, idx.height))
  }

  /** Complete uncompressed AVI: `pixel(frame, x, y, c)` with c in
    * stored BGR order; width/height need not be stride-aligned. */
  def encodeAvi(w: Int, h: Int, nFrames: Int,
                pixel: (Int, Int, Int, Int) => Int): Array[Byte] = {
    val rowSize = ((w * 3 + 3) / 4) * 4
    val frameBytes = rowSize * h
    // fixed-size header pieces (avih 56, strh 56, strf 40), then the
    // movi frames — sizes are known up front, so the whole file is ONE
    // pre-sized little-endian ByteBuffer (the encodeWav shape), no
    // repeated array concatenation on the per-document hot path
    val strlLen = 4 + (8 + 56) + (8 + 40)
    val hdrlLen = 4 + (8 + 56) + (8 + strlLen)
    val framePad = frameBytes & 1
    val moviLen = 4 + nFrames * (8 + frameBytes + framePad)
    val riffLen = 4 + (8 + hdrlLen) + (8 + moviLen)
    val bb = java.nio.ByteBuffer.allocate(8 + riffLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def fourcc(s: String): Unit = bb.put(s.getBytes("US-ASCII"))
    fourcc("RIFF"); bb.putInt(riffLen); fourcc("AVI ")
    fourcc("LIST"); bb.putInt(hdrlLen); fourcc("hdrl")
    fourcc("avih"); bb.putInt(56)
    bb.putInt(33333).putInt(frameBytes * 30).putInt(0).putInt(0)
      .putInt(nFrames).putInt(0).putInt(1).putInt(frameBytes)
      .putInt(w).putInt(h).putInt(0).putInt(0).putInt(0).putInt(0)
    fourcc("LIST"); bb.putInt(strlLen); fourcc("strl")
    fourcc("strh"); bb.putInt(56)
    fourcc("vids"); fourcc("DIB "); (0 until 12).foreach(_ => bb.putInt(0))
    fourcc("strf"); bb.putInt(40)
    bb.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
      .putInt(0).putInt(frameBytes).putInt(0).putInt(0).putInt(0).putInt(0)
    fourcc("LIST"); bb.putInt(moviLen); fourcc("movi")
    var f = 0
    while (f < nFrames) {
      fourcc("00db"); bb.putInt(frameBytes)
      var r = 0
      while (r < h) {
        val y = h - 1 - r // stored bottom-up
        var i = 0
        while (i < rowSize) {
          val v = if (i < w * 3) pixel(f, i / 3, y, i % 3) else 0
          bb.put(v.toByte)
          i += 1
        }
        r += 1
      }
      if (framePad == 1) bb.put(0.toByte)
      f += 1
    }
    bb.array()
  }
}
