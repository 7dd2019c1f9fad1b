package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Mirrors the reference's process-layer tests
  * (reference: tests/test_process.py) plus exhaustive checks. */
class PreprocessSpec extends SparkSpec {

  test("status map totality and exactness over codes -5..40 (test_stats.py:141-155 analog)") {
    val rows = (-5 to 40).zipWithIndex.map { case (code, i) =>
      Row(i + 1, 1704067200L + i, 1, code, "d.com", "c", 1.0)
    }
    val got = Preprocess.preprocessFtl(df(FtlFixture.Schema.toDDL, rows))
      .orderBy("id").select("status", "status_type").collect()
      .map(r => r.getByte(0).toInt -> r.getString(1))
    got.foreach { case (code, st) =>
      val expected =
        if (Preprocess.AllowedStatuses.contains(code)) "Allowed"
        else if (Preprocess.BlockedStatuses.contains(code)) "Blocked"
        else "Other"
      assert(st == expected, s"status $code")
    }
  }

  test("day/night boundary: hours 0,5 are Night; 6,23 are Day (process.py:64)") {
    // timestamps at exact hours on 2024-01-01 UTC
    val base = 1704067200L
    val rows = Seq(0, 5, 6, 23).zipWithIndex.map { case (h, i) =>
      Row(i + 1, base + h * 3600L, 1, 2, "d.com", "c", 1.0)
    }
    val got = Preprocess.preprocessFtl(df(FtlFixture.Schema.toDDL, rows))
      .orderBy("id").select("hour", "day_period").collect().toSeq
      .map(r => (r.getInt(0), r.getString(1)))
    assert(got == Seq((0, "Night"), (5, "Night"), (6, "Day"), (23, "Day")))
  }

  test("date truncation and weekday name (process.py:62,79)") {
    // 2024-01-01 was a Monday
    val r = Preprocess.preprocessFtl(df(FtlFixture.Schema.toDDL,
      Seq(Row(1, 1704067200L + 3661L, 1, 2, "d.com", "c", 1.0))))
      .select(col("date").cast("string"), col("day_name")).head
    assert(r.getString(0) == "2024-01-01" && r.getString(1) == "Monday")
  }

  test("invalid regex pattern is a no-op (test_process.py:66-74)") {
    val prep = FtlFixture.prep(spark, 1, 200)
    val out = Preprocess.regexAntiFilter(prep, "domain", Seq("[unclosed"))
    assert(out.count() == prep.count())
  }

  test("match-all regex empties the frame but keeps columns (test_process.py:86-93)") {
    val prep = FtlFixture.prep(spark, 1, 100)
    val out = Preprocess.regexAntiFilter(prep, "domain", Seq(".*"))
    assert(out.count() == 0 && out.columns.sameElements(prep.columns))
  }

  test("anti-filter keeps NULL-valued rows (str.contains na=False semantics)") {
    val rows = Seq(
      Row(1, 1704067200L, 1, 2, null, "c", 1.0),
      Row(2, 1704067201L, 1, 2, "ads.example.com", "c", 1.0),
      Row(3, 1704067202L, 1, 2, "ok.example.com", "c", 1.0))
    val prep = Preprocess.preprocessFtl(df(FtlFixture.Schema.toDDL, rows))
    val out = Preprocess.regexAntiFilter(prep, "domain", Seq("^ads\\."))
    assert(out.count() == 2) // null row survives, matching row dropped
    assert(out.filter(org.apache.spark.sql.functions.col("domain").isNull).count() == 1)
  }

  test("anti-filter drops exactly the matching rows (process.py:38-39)") {
    val prep = FtlFixture.prep(spark, 1, 500)
    val blocked = prep.filter(col("domain").rlike("blockeddomain")).count()
    val out = Preprocess.regexAntiFilter(prep, "domain", Seq("blockeddomain"))
    assert(out.count() == prep.count() - blocked && blocked > 0)
  }

  test("reply_time coercion: invalid string → null (process.py:80 try_cast)") {
    // FTL schema has reply_time REAL but the reference coerces via
    // to_numeric; our path casts safely. Simulate via string schema.
    val ddl = "id INT, timestamp BIGINT, type INT, status INT, domain STRING, client STRING, reply_time STRING"
    val out = Preprocess.preprocessFtl(df(ddl,
      Seq(Row(1, 1704067200L, 1, 2, "d.com", "c", "1.5"),
        Row(2, 1704067201L, 1, 2, "d.com", "c", "oops"))))
      .select("reply_time").collect().toSeq.map(r => Option(r.get(0)))
    assert(out == Seq(Some(1.5), None))
  }
}
