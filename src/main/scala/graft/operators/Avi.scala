package graft.operators

/** Uncompressed AVI (RIFF 'AVI ') in pure JVM — the VIDEO member of the
  * real-decode family (BMP m06, PNG m07, JPEG m08, WAV m09): a real
  * container walk over the public RIFF/AVI layout (`hdrl` → `avih` main
  * header for dims + frame count, nested `strl` stream list, `movi`
  * LIST holding one `00db` chunk of raw bottom-up BGR DIB data per
  * frame, with the same 4-byte row alignment as a BMP pixel array).
  * Frame extraction is an OFFSET SEEK, not a decode-everything pass —
  * exactly why video pipelines sample frames before decoding (m03's
  * index arithmetic, now against real bytes).
  *
  * Scope (everything else None, never throw): single video stream,
  * 24-bpp BI_RGB frames (`00db` = uncompressed DIB), no idx1 required.
  */
object Avi {

  private def le32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) | ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
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
    val offsets = scala.collection.mutable.ArrayBuffer.empty[Int]
    // walk top-level chunks; descend into LIST('hdrl') for avih and
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
        } else if (inMovi && (id == "00db" || id == "00dc")) {
          offsets += o + 8
        }
        o += 8 + len + (len & 1) // RIFF word alignment
      }
      true
    }
    if (!walk(12, math.min(b.length, 8 + le32(b, 4)), inMovi = false)) return None
    if (w <= 0 || h <= 0 || offsets.isEmpty) return None
    if (w.toLong * h * 3 > Int.MaxValue) return None
    val rowSize = ((w.toLong * 3 + 3) / 4) * 4
    val frameBytes = rowSize * h
    // every frame's declared data must really be in-buffer
    if (offsets.exists(off => off.toLong + frameBytes > b.length)) return None
    if (total > 0 && total != offsets.length) return None
    Some(AviIndex(w, h, offsets.length, offsets.toArray))
  }

  /** Decode ONE frame's pixels (image order, top row first, BGR) — the
    * BMP pixel-array walk (bottom-up, 4-byte row alignment) applied at
    * the frame's offset. */
  def decodeFrame(b: Array[Byte], idx: AviIndex, frame: Int): Option[Array[Int]] = {
    if (frame < 0 || frame >= idx.nFrames) return None
    val w = idx.width; val h = idx.height
    val rowSize = ((w * 3 + 3) / 4) * 4
    val base = idx.frameOffsets(frame)
    val px = new Array[Int](w * h * 3)
    var r = 0
    while (r < h) {
      val y = h - 1 - r
      val src = base + r * rowSize
      var x = 0
      while (x < w) {
        val d = (y * w + x) * 3
        px(d) = b(src + x * 3) & 0xff
        px(d + 1) = b(src + x * 3 + 1) & 0xff
        px(d + 2) = b(src + x * 3 + 2) & 0xff
        x += 1
      }
      r += 1
    }
    Some(px)
  }

  /** Complete uncompressed AVI: `pixel(frame, x, y, c)` with c in
    * stored BGR order; width/height need not be stride-aligned. */
  def encodeAvi(w: Int, h: Int, nFrames: Int,
                pixel: (Int, Int, Int, Int) => Int): Array[Byte] = {
    val rowSize = ((w * 3 + 3) / 4) * 4
    val frameBytes = rowSize * h
    val out = new java.io.ByteArrayOutputStream()
    def le32(v: Int): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def chunk(id: String, data: Array[Byte]): Array[Byte] = {
      val pad = if (data.length % 2 == 1) Array(0.toByte) else Array.emptyByteArray
      id.getBytes("US-ASCII") ++ le32(data.length) ++ data ++ pad
    }
    def list(typ: String, body: Array[Byte]): Array[Byte] =
      chunk("LIST", typ.getBytes("US-ASCII") ++ body)
    val avih = le32(33333) ++ le32(frameBytes * 30) ++ le32(0) ++ le32(0) ++
      le32(nFrames) ++ le32(0) ++ le32(1) ++ le32(frameBytes) ++
      le32(w) ++ le32(h) ++ Array.fill(16)(0.toByte)
    val strh = "vids".getBytes("US-ASCII") ++ "DIB ".getBytes("US-ASCII") ++
      Array.fill(48)(0.toByte)
    val strf = le32(40) ++ le32(w) ++ le32(h) ++
      Array[Byte](1, 0, 24, 0) ++ le32(0) ++ le32(frameBytes) ++
      Array.fill(16)(0.toByte)
    val hdrl = list("hdrl", chunk("avih", avih) ++
      list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
    val frames = (0 until nFrames).flatMap { f =>
      val data = new Array[Byte](frameBytes)
      for (r <- 0 until h; x <- 0 until w; c <- 0 until 3) {
        val y = h - 1 - r // stored bottom-up
        data(r * rowSize + x * 3 + c) = pixel(f, x, y, c).toByte
      }
      chunk("00db", data)
    }.toArray
    val movi = list("movi", frames)
    val body = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi
    out.write("RIFF".getBytes("US-ASCII")); out.write(le32(body.length))
    out.write(body)
    out.toByteArray
  }
}
