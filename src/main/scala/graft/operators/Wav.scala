package graft.operators

/** RIFF/WAVE PCM codec in pure JVM — the AUDIO member of the
  * real-decode family (BMP m06, PNG m07, JPEG m08): [[encodeWav]]
  * writes complete spec-valid WAV files (RIFF header, `fmt ` chunk,
  * interleaved little-endian PCM `data` chunk), [[decodeWav]] walks
  * the chunk list back (skipping ancillary chunks by their declared
  * size, word-aligned per the RIFF spec), validates the format, and
  * de-interleaves the samples per channel. Scope: PCM (format 1) at
  * the three integer widths real WAV files carry — 8-bit (UNSIGNED on
  * disk per the format's convention, returned centered: v−128),
  * 16-bit and 24-bit (both signed little-endian) — 1–2 channels;
  * anything else — compressed formats, float/32-bit, truncated or
  * lying chunk sizes — returns None, never throws (the mapPartitions
  * decode-stage contract shared by the image decoders). */
object Wav {

  /** (channels, sampleRate, samples) — samples(ch)(i), de-interleaved,
    * each value a SIGNED amplitude at the file's bit width (8-bit files
    * are centered from their on-disk unsigned form). */
  final case class Pcm(channels: Int, sampleRate: Int,
                       samples: Array[Array[Int]], bits: Int = 16)

  private def le32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) | ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
  private def le16(b: Array[Byte], o: Int): Int = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def tag(b: Array[Byte], o: Int): String = new String(b, o, 4, "US-ASCII")

  def decodeWav(b: Array[Byte]): Option[Pcm] = {
    if (b.length < 44 || tag(b, 0) != "RIFF" || tag(b, 8) != "WAVE") return None
    var channels = 0; var rate = 0; var bits = 0; var blockAlign = 0
    var dataOff = -1; var dataLen = 0
    var o = 12
    while (o + 8 <= b.length) {
      val id = tag(b, o)
      val len = le32(b, o + 4)
      if (len < 0 || o.toLong + 8 + len > b.length) return None
      id match {
        case "fmt " =>
          if (len < 16) return None
          val fmt = le16(b, o + 8)
          channels = le16(b, o + 10)
          rate = le32(b, o + 12)
          blockAlign = le16(b, o + 20)
          bits = le16(b, o + 22)
          if (fmt != 1) return None // PCM only
        case "data" => dataOff = o + 8; dataLen = len
        case _ => () // ancillary chunk (LIST, fact, …): skip by size
      }
      o += 8 + len + (len & 1) // RIFF chunks are word-aligned
    }
    if (channels < 1 || channels > 2 || rate <= 0 || dataOff < 0 ||
        (bits != 8 && bits != 16 && bits != 24)) return None
    val bytesPer = bits / 8
    if (blockAlign != channels * bytesPer) return None
    if (dataLen % blockAlign != 0) return None
    val n = dataLen / blockAlign
    val out = Array.fill(channels)(new Array[Int](n))
    var i = 0
    while (i < n) {
      var c = 0
      while (c < channels) {
        val p = dataOff + i * blockAlign + c * bytesPer
        out(c)(i) = bits match {
          case 8 => (b(p) & 0xff) - 128 // stored unsigned, center it
          case 16 => (le16(b, p) << 16) >> 16 // sign-extend
          case _ => // 24-bit LE signed
            val v = (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8) | ((b(p + 2) & 0xff) << 16)
            (v << 8) >> 8
        }
        c += 1
      }
      i += 1
    }
    Some(Pcm(channels, rate, out, bits))
  }

  /** Complete PCM WAV at `bits` ∈ {8, 16, 24}: `sample(i, ch)` must
    * return a SIGNED value fitting the width for frame i of channel ch
    * (8-bit files store it offset by +128 per the format). */
  def encodeWav(nFrames: Int, channels: Int, sampleRate: Int,
                sample: (Int, Int) => Int, bits: Int = 16): Array[Byte] = {
    require(channels == 1 || channels == 2)
    require(bits == 8 || bits == 16 || bits == 24)
    val bytesPer = bits / 8
    val dataLen = nFrames * channels * bytesPer
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(channels.toShort).putInt(sampleRate)
      .putInt(sampleRate * channels * bytesPer)
      .putShort((channels * bytesPer).toShort).putShort(bits.toShort)
    bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
    val lo = -(1 << (bits - 1)); val hi = (1 << (bits - 1)) - 1
    var i = 0
    while (i < nFrames) {
      var c = 0
      while (c < channels) {
        val v = sample(i, c)
        require(v >= lo && v <= hi)
        bits match {
          case 8 => bb.put((v + 128).toByte)
          case 16 => bb.putShort(v.toShort)
          case _ =>
            bb.put(v.toByte).put((v >> 8).toByte).put((v >> 16).toByte)
        }
        c += 1
      }
      i += 1
    }
    bb.array()
  }
}
