package graft.sources

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Generative round-trip for the CREATE TABLE parser: build DDL from a
  * random column list — adversarial identifiers (quoted, embedded
  * commas/parens/keywords, doubled quotes) and adversarial constraints
  * (string literals holding commas, parens, fake PRIMARY KEY text) —
  * and require columnsOf to return exactly the generated names in
  * order. Fixed seeds: failures reproduce. */
class SqliteDdlPropertySpec extends AnyFunSuite {

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  private val plainName: Gen[String] = for {
    h <- Gen.alphaChar
    t <- Gen.listOfN(5, Gen.alphaNumChar)
  } yield (h :: t).mkString

  /** A name plus its DDL spelling — quoted forms may contain characters
    * that break a non-quote-aware splitter. */
  private val namedIdent: Gen[(String, String)] = Gen.oneOf(
    plainName.map(n => (n, n)),
    plainName.map(n => (s"$n, x", "\"" + n + ", x\"")),      // comma inside "
    plainName.map(n => (s"$n(1)", s"[$n(1)]")),              // parens inside [ ]
    plainName.map(n => (s"$n y", s"`$n y`")),                // space inside `
    plainName.map(n => (n + "\"q", "\"" + n + "\"\"q\"")))   // doubled-quote escape

  private val colType: Gen[String] =
    Gen.oneOf("INTEGER", "TEXT", "REAL", "BLOB", "")

  private val constraintTail: Gen[String] = Gen.oneOf(
    Gen.const(""),
    Gen.const(" NOT NULL"),
    Gen.const(" DEFAULT 'a,b(c'"),                  // comma+paren in literal
    Gen.const(" CHECK (col NOT IN ('p,q', 'r(s'))"),
    Gen.const(" DEFAULT 'it''s, ok'"),              // '' escape then comma
    Gen.const(" COLLATE NOCASE"))

  private def ddlOf(cols: Seq[(String, String, String, String)],
                    tableConstraints: Seq[String]): String =
    "CREATE TABLE t (" +
      (cols.map { case (_, sp, ty, tail) => s"$sp $ty$tail" } ++
        tableConstraints).mkString(", ") + ")"

  test("columnsOf returns exactly the declared names, in order, for adversarial DDL") {
    for (seed <- 1L to 40L) {
      val n = 1 + (seed % 6).toInt
      val cols = (0 until n).map { i =>
        val (name, spelled) = sample(namedIdent, seed * 31 + i)
        val ty = sample(colType, seed * 17 + i)
        val tail = sample(constraintTail, seed * 13 + i)
        (name, spelled, ty, tail)
      }
      // de-dup generated names (SQLite would reject duplicates anyway)
      val distinctCols = cols.groupBy(_._1).map(_._2.head).toSeq
        .sortBy(c => cols.indexOf(c))
      val constraints = Seq("CHECK (x <> 'PRIMARY KEY (fake, list)')",
        "UNIQUE (" + distinctCols.head._2 + ")")
      val ddl = ddlOf(distinctCols, constraints)
      val parsed = SqliteRead.columnsOf(ddl)
      assert(parsed == distinctCols.map(_._1),
        s"seed=$seed\nddl=$ddl\nparsed=$parsed\nexpected=${distinctCols.map(_._1)}")
    }
  }

  test("rowidAliasOf survives adversarial neighbors and finds the one alias") {
    for (seed <- 1L to 20L) {
      val (noise, noiseSp) = sample(namedIdent, seed * 7)
      val tail = sample(constraintTail, seed * 5)
      val ddl = s"CREATE TABLE t ($noiseSp TEXT$tail, " +
        "rid INTEGER NOT NULL PRIMARY KEY, v BLOB)"
      assert(SqliteRead.rowidAliasOf(ddl).contains("rid"), s"seed=$seed ddl=$ddl")
      assert(SqliteRead.columnsOf(ddl) == Seq(noise, "rid", "v"))
    }
  }
}
