package graft.operators

/** RIFF/WAVE PCM16 codec in pure JVM — the AUDIO member of the
  * real-decode family (BMP m06, PNG m07, JPEG m08): [[encodeWav]]
  * writes complete spec-valid WAV files (RIFF header, `fmt ` chunk,
  * interleaved little-endian PCM16 `data` chunk), [[decodeWav]] walks
  * the chunk list back (skipping ancillary chunks by their declared
  * size, word-aligned per the RIFF spec), validates the format, and
  * de-interleaves the samples per channel. Scope: PCM (format 1),
  * 16-bit, 1–2 channels; anything else — compressed formats, other bit
  * depths, truncated or lying chunk sizes — returns None, never throws
  * (the mapPartitions decode-stage contract shared by the image
  * decoders). */
object Wav {

  /** (channels, sampleRate, samples) — samples(ch)(i), de-interleaved,
    * each value a signed 16-bit amplitude. */
  final case class Pcm(channels: Int, sampleRate: Int, samples: Array[Array[Int]])

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
    if (channels < 1 || channels > 2 || bits != 16 || rate <= 0 ||
        dataOff < 0 || blockAlign != channels * 2) return None
    if (dataLen % blockAlign != 0) return None
    val n = dataLen / blockAlign
    val out = Array.fill(channels)(new Array[Int](n))
    var i = 0
    while (i < n) {
      var c = 0
      while (c < channels) {
        val v = le16(b, dataOff + i * blockAlign + c * 2)
        out(c)(i) = (v << 16) >> 16 // sign-extend the 16-bit sample
        c += 1
      }
      i += 1
    }
    Some(Pcm(channels, rate, out))
  }

  /** Complete PCM16 WAV: `sample(i, ch)` must return a signed 16-bit
    * value for frame i of channel ch. */
  def encodeWav(nFrames: Int, channels: Int, sampleRate: Int,
                sample: (Int, Int) => Int): Array[Byte] = {
    require(channels == 1 || channels == 2)
    val dataLen = nFrames * channels * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(channels.toShort).putInt(sampleRate)
      .putInt(sampleRate * channels * 2).putShort((channels * 2).toShort).putShort(16)
    bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < nFrames) {
      var c = 0
      while (c < channels) {
        val v = sample(i, c)
        require(v >= -32768 && v <= 32767)
        bb.putShort(v.toShort)
        c += 1
      }
      i += 1
    }
    bb.array()
  }
}
