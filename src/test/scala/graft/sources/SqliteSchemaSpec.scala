package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** CREATE TABLE parsing corner cases — pure-function tests, no Spark.
  * SQLite accepts many legal spellings of the same schema
  * (sqlite.org/lang_createtable.html); the reader must map every one of
  * them to the same column list and rowid-alias decision, because a miss
  * is SILENT (the alias column reads NULL for every row). */
class SqliteSchemaSpec extends AnyFunSuite {

  test("columnsOf: plain list") {
    assert(SqliteRead.columnsOf("CREATE TABLE t(a INTEGER, b TEXT, c REAL)") ==
      Seq("a", "b", "c"))
  }

  test("columnsOf: table-level constraints are not columns") {
    val sql = "CREATE TABLE t(a INTEGER, b TEXT, PRIMARY KEY(a), " +
      "UNIQUE(b), CHECK(a > 0), FOREIGN KEY(b) REFERENCES u(x), " +
      "CONSTRAINT c1 CHECK(b <> ''))"
    assert(SqliteRead.columnsOf(sql) == Seq("a", "b"))
  }

  test("columnsOf: a comma inside a DEFAULT string literal must not split the list") {
    val sql = "CREATE TABLE t(a TEXT DEFAULT 'x,y', b INTEGER)"
    assert(SqliteRead.columnsOf(sql) == Seq("a", "b"))
  }

  test("columnsOf: parens and commas inside CHECK literals must not shift columns") {
    val sql = "CREATE TABLE t(a TEXT CHECK(a NOT IN ('p,q', 'r(s')), b INTEGER)"
    assert(SqliteRead.columnsOf(sql) == Seq("a", "b"))
  }

  test("columnsOf: quoted identifiers, including embedded comma and doubled quotes") {
    val sql = "CREATE TABLE t(\"weird, name\" TEXT, [brack col] INTEGER, " +
      "`tick` REAL, \"do\"\"uble\" TEXT)"
    assert(SqliteRead.columnsOf(sql) ==
      Seq("weird, name", "brack col", "tick", "do\"uble"))
  }

  test("rowidAliasOf: adjacent-token spelling still detected") {
    assert(SqliteRead.rowidAliasOf("CREATE TABLE t(id INTEGER PRIMARY KEY, v TEXT)")
      .contains("id"))
  }

  test("rowidAliasOf: intervening constraints (NOT NULL) between type and PRIMARY KEY") {
    assert(SqliteRead.rowidAliasOf(
      "CREATE TABLE t(id INTEGER NOT NULL PRIMARY KEY AUTOINCREMENT, v TEXT)")
      .contains("id"))
  }

  test("rowidAliasOf: table-level PRIMARY KEY(col) on an INTEGER column") {
    assert(SqliteRead.rowidAliasOf(
      "CREATE TABLE t(id INTEGER, v TEXT, PRIMARY KEY(id))").contains("id"))
  }

  test("rowidAliasOf: table-level PK on a TEXT column is NOT a rowid alias") {
    assert(SqliteRead.rowidAliasOf(
      "CREATE TABLE t(id TEXT, v TEXT, PRIMARY KEY(id))").isEmpty)
  }

  test("rowidAliasOf: composite table-level PK never aliases") {
    assert(SqliteRead.rowidAliasOf(
      "CREATE TABLE t(a INTEGER, b INTEGER, PRIMARY KEY(a, b))").isEmpty)
  }

  test("rowidAliasOf: INT (not INTEGER) does not alias — spec quirk") {
    assert(SqliteRead.rowidAliasOf(
      "CREATE TABLE t(id INT PRIMARY KEY, v TEXT)").isEmpty)
  }

  test("rowidAliasOf: column-level PRIMARY KEY DESC does not alias — spec quirk") {
    assert(SqliteRead.rowidAliasOf(
      "CREATE TABLE t(id INTEGER PRIMARY KEY DESC, v TEXT)").isEmpty)
  }

  test("rowidAliasOf: PRIMARY KEY ASC aliases") {
    assert(SqliteRead.rowidAliasOf(
      "CREATE TABLE t(id INTEGER PRIMARY KEY ASC, v TEXT)").contains("id"))
  }

  test("rowidAliasOf: a CHECK literal containing 'PRIMARY KEY' does not confuse detection") {
    assert(SqliteRead.rowidAliasOf(
      "CREATE TABLE t(a TEXT CHECK(a <> 'PRIMARY KEY'), b INTEGER)").isEmpty)
  }
}
