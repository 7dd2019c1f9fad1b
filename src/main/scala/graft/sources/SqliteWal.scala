package graft.sources

import java.io.RandomAccessFile

import scala.collection.mutable

/** SQLite write-ahead-log sidecar parser (public format:
  * sqlite.org/fileformat2 §"WAL File Format"). A live WAL-mode database —
  * the reference's actual deployment shape, since Pi-hole's FTL keeps its
  * long-term DB in WAL mode (reference: db.py:16-30 reads it via SQLite,
  * which replays the WAL transparently) — stores committed transactions as
  * page images in `<db>-wal` until a checkpoint copies them back. A reader
  * that ignores the sidecar returns a stale prefix of the table; this
  * parser recovers the committed page set so [[SqliteRead]] can overlay it.
  *
  * Format recap:
  *   - 32-byte header: magic (0x377f0682 little-endian checksums /
  *     0x377f0683 big-endian), format version, page size, checkpoint
  *     sequence, salt-1/salt-2, header checksum over bytes 0-23;
  *   - each frame: 24-byte header (page number, DB size in pages for
  *     commit frames else 0, both salts, cumulative checksum) + one page
  *     image;
  *   - a frame is valid iff its salts match the header AND the cumulative
  *     checksum (seeded by the header checksum, folded over the first 8
  *     frame-header bytes + the page image) matches — exactly SQLite's
  *     crash-recovery rule, so torn tails are dropped, not read;
  *   - only frames up to the LAST COMMIT frame are visible (an
  *     uncommitted transaction's frames sit past it and must be ignored).
  *
  * The checksum folds 8 bytes at a time as two 32-bit words (byte order
  * per the magic): s1 += x1 + s2; s2 += x2 + s1 — Int overflow IS the
  * required mod-2^32 arithmetic.
  */
object SqliteWal {

  /** The committed page overlay of a WAL sidecar: page size, a map from
    * page number to the byte offset OF THE PAGE IMAGE inside the WAL file
    * (latest valid committed frame wins, matching SQLite's
    * newest-frame-first lookup), and the header salts the overlay was
    * parsed under — readers that reopen the sidecar later revalidate the
    * salts to detect a checkpoint-reset in between ([[validateSalts]]).
    * Empty map = nothing to replay (e.g. the zero-length file a TRUNCATE
    * checkpoint leaves behind, or a stale tail whose salts no longer
    * match). */
  final case class Overlay(pageSize: Int, pages: Map[Int, Long],
                           salt1: Int, salt2: Int)

  def pageMap(walPath: String): Overlay = {
    val f = new RandomAccessFile(walPath, "r")
    try {
      if (f.length() < 32) return Overlay(0, Map.empty, 0, 0)
      val hdr = new Array[Byte](32)
      f.seek(0); f.readFully(hdr)
      val magic = be32(hdr, 0)
      // SQLite's recovery rule (walIndexRecover) treats ANY header that
      // fails validation — wrong magic and nonsense page size included —
      // as an empty WAL, not an error: a stray or garbage `<db>-wal`
      // sidecar must not block reading the main file. Same branch as the
      // header-checksum mismatch below.
      if (magic != 0x377f0682 && magic != 0x377f0683)
        return Overlay(0, Map.empty, 0, 0)
      val le = magic == 0x377f0682
      val pageSize = be32(hdr, 8)
      if (pageSize < 512 || pageSize > 65536 || Integer.bitCount(pageSize) != 1)
        return Overlay(0, Map.empty, 0, 0)
      val salt1 = be32(hdr, 16)
      val salt2 = be32(hdr, 20)
      var (s1, s2) = cksum(0, 0, hdr, 0, 24, le)
      // header checksum mismatch = the WAL was never written post-reset;
      // treat as empty rather than failing (SQLite does the same)
      if (s1 != be32(hdr, 24) || s2 != be32(hdr, 28))
        return Overlay(pageSize, Map.empty, salt1, salt2)
      val frameSize = 24L + pageSize
      val nFrames = ((f.length() - 32) / frameSize).toInt
      // tentative: frames since the last commit — promoted only when a
      // commit frame closes the transaction
      val tentative = mutable.Map.empty[Int, Long]
      val valid = mutable.Map.empty[Int, Long]
      val fh = new Array[Byte](24)
      val pg = new Array[Byte](pageSize)
      var i = 0
      var stop = false
      while (i < nFrames && !stop) {
        f.seek(32 + i * frameSize)
        f.readFully(fh); f.readFully(pg)
        if (be32(fh, 8) != salt1 || be32(fh, 12) != salt2) stop = true
        else {
          val (t1, t2) = cksum(s1, s2, fh, 0, 8, le) match {
            case (a, b) => cksum(a, b, pg, 0, pageSize, le)
          }
          if (t1 != be32(fh, 16) || t2 != be32(fh, 20)) stop = true
          else {
            s1 = t1; s2 = t2
            tentative(be32(fh, 0)) = 32 + i * frameSize + 24
            if (be32(fh, 4) != 0) { // commit frame: DB size field non-zero
              valid ++= tentative
              tentative.clear()
            }
            i += 1
          }
        }
      }
      Overlay(pageSize, valid.toMap, salt1, salt2)
    } finally f.close()
  }

  /** Guard for readers that parsed the WAL once and reopen it later (the
    * executor side of [[SqliteRead]]): a checkpoint-and-reset on a LIVE
    * database between parse and read rotates the header salts and rewrites
    * frames in place, so memoized byte offsets would silently serve NEW
    * transactions' page images as if they were the old committed state.
    * Real SQLite readers pin against this with shm read-marks; a
    * file-level reader can only detect-and-fail. Throws on mismatch. */
  def validateSalts(walPath: String, salt1: Int, salt2: Int): Unit = {
    val f = new RandomAccessFile(walPath, "r")
    try {
      val ok = f.length() >= 32 && {
        val hdr = new Array[Byte](32)
        f.seek(0); f.readFully(hdr)
        be32(hdr, 16) == salt1 && be32(hdr, 20) == salt2
      }
      if (!ok) throw new IllegalStateException(
        s"$walPath: WAL salts changed since the driver parsed the overlay " +
          "— a checkpoint reset the log mid-read (live writer). Re-run the " +
          "read, or copy the database (sqlite3 .backup) for a stable snapshot.")
    } finally f.close()
  }

  private def be32(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 24) | ((b(o + 1) & 0xff) << 16) |
      ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)

  private def le32(b: Array[Byte], o: Int): Int =
    ((b(o + 3) & 0xff) << 24) | ((b(o + 2) & 0xff) << 16) |
      ((b(o + 1) & 0xff) << 8) | (b(o) & 0xff)

  /** Cumulative WAL checksum over `len` bytes (must be a multiple of 8). */
  private def cksum(s1in: Int, s2in: Int, b: Array[Byte], off: Int, len: Int,
                    littleEndian: Boolean): (Int, Int) = {
    var s1 = s1in; var s2 = s2in
    var i = off
    val end = off + len
    while (i < end) {
      val x1 = if (littleEndian) le32(b, i) else be32(b, i)
      val x2 = if (littleEndian) le32(b, i + 4) else be32(b, i + 4)
      s1 += x1 + s2
      s2 += x2 + s1
      i += 8
    }
    (s1, s2)
  }
}
