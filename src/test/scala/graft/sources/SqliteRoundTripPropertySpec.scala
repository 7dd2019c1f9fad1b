package graft.sources

import java.nio.file.{Files, Paths}

import scala.sys.process._

import graft.SparkSpec

/** Generative page-level round-trip property test for [[SqliteRead]]
  * (extends `SqliteDdlPropertySpec` from DDL strings to FULL FILES): 50
  * seeded random databases are written by the REAL sqlite3 library — the
  * authority on the file format — via `tools/gen_sqlite_roundtrip.py`,
  * then read back with [[SqliteRead.readTable]] and compared row-for-row
  * against the parquet twin of the exact rows inserted.
  *
  * The generator biases values toward the format's edges: every INTEGER
  * serial-type width (including Long.MIN/MAX and negative keys — 9-byte
  * varints on the rowid-alias path), ±inf and subnormal REALs, integral
  * floats (SQLite's REAL→INTEGER storage optimization, which the reader
  * must coerce back to double), TEXT/BLOB byte lengths straddling the
  * single-page overflow threshold (usable−35) and multi-page overflow
  * chains, row counts forcing interior-page splits at page_size 512, all
  * three text encodings, and plain / rowid-alias / WITHOUT ROWID table
  * shapes. Fixtures are generated at test time into a temp dir (≈40 MB —
  * deliberately NOT committed), deterministically from a fixed seed.
  */
class SqliteRoundTripPropertySpec extends SparkSpec {

  private val Seed = 20260813
  private val NCases = 50

  private lazy val dir: String = {
    val out = Files.createTempDirectory("graft_sqlite_roundtrip").toString
    val tool = Paths.get("tools/gen_sqlite_roundtrip.py").toAbsolutePath
    assert(Files.exists(tool), s"generator missing: $tool")
    val cmd = Seq("python3", tool.toString, Seed.toString, NCases.toString, out)
    val rc = cmd.!
    assert(rc == 0, s"fixture generation failed (exit $rc)")
    out
  }

  /** Canonical value key. The one deliberate normalization: 0.0 and -0.0
    * compare equal, because SQLite's REAL→INTEGER storage optimization
    * stores -0.0 as integer 0 (its round-trip check uses ==), so the sign
    * of zero is not representable in the file. Everything else compares
    * on exact bits. */
  private def key(v: Any): String = v match {
    case null           => "∅"
    case d: Double      => if (d == 0.0) "0" else java.lang.Double.doubleToLongBits(d).toString
    case b: Array[Byte] => b.map("%02x".format(_)).mkString
    case x              => String.valueOf(x)
  }

  private def rowKeys(dfx: org.apache.spark.sql.DataFrame): Seq[String] =
    dfx.collect().toSeq.map(_.toSeq.map(key).mkString("|")).sorted

  test(s"$NCases seeded random databases round-trip row-for-row through the page reader") {
    (0 until NCases).foreach { i =>
      val meta = new String(Files.readAllBytes(Paths.get(s"$dir/case_$i.meta"))).trim
      val expected = spark.read.parquet(s"$dir/case_${i}_expected.parquet")
      val got = SqliteRead.readTable(
        spark, s"$dir/case_$i.db", "t", expected.schema, numPartitions = 4)
      val (e, g) = (rowKeys(expected), rowKeys(got))
      assert(g.length == e.length, s"case $i [$meta]: ${g.length} rows, expected ${e.length}")
      val firstDiff = e.zip(g).indexWhere { case (a, b) => a != b }
      if (firstDiff >= 0) fail(
        s"case $i [$meta] first diff at sorted row $firstDiff:\n" +
          s"  expected ${e(firstDiff).take(300)}\n  got      ${g(firstDiff).take(300)}")
    }
  }
}
