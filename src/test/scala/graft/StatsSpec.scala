package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import graft.operators.Stats

/** Mirrors the reference's stats edge-case matrix
  * (reference: tests/test_stats.py; FIXTURES.md §5). */
class StatsSpec extends SparkSpec {

  private def prepOf(rows: Seq[Row]): DataFrame =
    Preprocess.preprocessFtl(df(FtlFixture.Schema.toDDL, rows))

  private val emptyPrep = prepOf(Seq.empty)

  test("empty relation: no throw, zero totals (test_stats.py:293-318)") {
    val t = Stats.totals(emptyPrep).head
    assert(t.getLong(0) == 0 && t.getLong(1) == 0 && t.getLong(2) == 0)
    assert(t.getDouble(3) == 0.0 && t.getDouble(4) == 0.0)
    // every stat query must yield a plan that executes on empty input
    assert(Stats.topClient(emptyPrep).count() == 0)
    assert(Stats.dailyCounts(emptyPrep).count() == 0)
    assert(Stats.replyStats(emptyPrep).head.getDouble(0) == 0.0)
    assert(graft.operators.Streaks.longestIdle(emptyPrep).count() == 0)
  }

  test("single row: totals=1, class count correct (test_stats.py:320-343)") {
    val t = Stats.totals(prepOf(Seq(Row(1, 1704067200L, 1, 2, "d.com", "c", 1.0)))).head
    assert(t.getLong(0) == 1 && t.getLong(1) == 0 && t.getLong(2) == 1)
    assert(t.getDouble(4) == 100.0)
  }

  test("all blocked → pct exactly 100/0 (test_stats.py:345-393)") {
    val rows = (1 to 50).map(i => Row(i, 1704067200L + i, 1, 1, "b.com", "c", 1.0))
    val t = Stats.totals(prepOf(rows)).head
    assert(t.getDouble(3) == 100.0 && t.getDouble(4) == 0.0)
  }

  test("only Other statuses → zero class counts (test_stats.py:395-418)") {
    val rows = (1 to 20).map(i => Row(i, 1704067200L + i, 1, 99, "o.com", "c", 1.0))
    val t = Stats.totals(prepOf(rows)).head
    assert(t.getLong(1) == 0 && t.getLong(2) == 0 && t.getDouble(3) == 0.0)
  }

  test("all-null reply times → 0.0 sentinels (test_stats.py:420-442)") {
    val rows = (1 to 10).map(i => Row(i, 1704067200L + i, 1, 2, "d.com", "c", null))
    val r = Stats.replyStats(prepOf(rows)).head
    assert(r.getDouble(0) == 0.0 && r.getDouble(1) == 0.0 && r.getDouble(2) == 0.0)
    assert(Stats.slowestDomain(prepOf(rows)).count() == 0)
  }

  test("single client+domain → distinct counts 1 (test_stats.py:444-467)") {
    val rows = (1 to 10).map(i => Row(i, 1704067200L + i, 1, 2, "only.com", "c1", 1.0))
    val d = Stats.distinctCounts(prepOf(rows)).head
    assert(d.getLong(0) == 1 && d.getLong(1) == 1)
  }

  test("invariants on a fixture: counts sum ≤ total, pcts sum to 100, hour bounds") {
    val prep = FtlFixture.prep(spark, 1, 2000)
    val t = Stats.totals(prep).head
    assert(t.getLong(1) + t.getLong(2) <= t.getLong(0))
    assert(math.abs(t.getDouble(3) + t.getDouble(4) - 100.0) < 1e-6) // generator emits no Other
    val hours = Stats.hourlyCounts(prep).select("hour").collect().map(_.getInt(0))
    assert(hours.forall(h => h >= 0 && h <= 23))
    val wd = Stats.weekdayAvg(prep)
    assert(wd.count() <= 7)
  }

  test("top-1 tie-break is deterministic: smallest key wins (SURVEY.md §7.3-1)") {
    // two clients with identical counts
    val rows = Seq(
      Row(1, 1704067200L, 1, 2, "d.com", "zz-client", 1.0),
      Row(2, 1704067201L, 1, 2, "d.com", "aa-client", 1.0))
    assert(Stats.topClient(prepOf(rows)).head.getString(0) == "aa-client")
  }

  test("A5 asymmetry quirk: all-status count for the class argmax domain (stats.py:84-99)") {
    // domain X: 2 allowed + 3 blocked rows; domain Y: 1 allowed.
    // top allowed domain = X (2 > 1); its all-status count must be 5.
    val rows = Seq(
      Row(1, 1704067200L, 1, 2, "x.com", "c1", 1.0),
      Row(2, 1704067201L, 1, 3, "x.com", "c2", 1.0),
      Row(3, 1704067202L, 1, 1, "x.com", "c1", 1.0),
      Row(4, 1704067203L, 1, 4, "x.com", "c1", 1.0),
      Row(5, 1704067204L, 1, 5, "x.com", "c3", 1.0),
      Row(6, 1704067205L, 1, 2, "y.com", "c1", 1.0))
    val r = graft.operators.Stats.topDomainOfClass(prepOf(rows), "Allowed").head
    assert(r.getString(0) == "x.com")
    assert(r.getLong(1) == 2)  // class_cnt: allowed only
    assert(r.getLong(2) == 5)  // all_cnt: ALL statuses — the quirk
    assert(r.getString(3) == "c1") // top client within class (2 allowed? c1:1, c2:1 → tie → asc → c1)
  }

  test("EWMA daily: recurrence y_t = 0.3 x_t + 0.7 y_{t-1}, seeded at x_0") {
    // one status class (Allowed), three days with counts 2, 1, 3:
    // y0=2, y1=.3*1+.7*2=1.7, y2=.3*3+.7*1.7=2.09
    def day(n: Int) = 1704067200L + n * 86400L
    val rows = Seq(
      Row(1, day(0), 1, 2, "d", "c", 1.0), Row(2, day(0), 1, 2, "d", "c", 1.0),
      Row(3, day(1), 1, 2, "d", "c", 1.0),
      Row(4, day(2), 1, 2, "d", "c", 1.0), Row(5, day(2), 1, 2, "d", "c", 1.0),
      Row(6, day(2), 1, 2, "d", "c", 1.0))
    val e = Stats.ewmaDaily(prepOf(rows)).collect().map(_.getDouble(2)).toSeq
    assert(e == Seq(2.0, 1.7, 2.09))
    // empty input: plan still executes
    assert(Stats.ewmaDaily(emptyPrep).count() == 0)
  }

  test("client rank distributions: percent_rank in [0,1], cume_dist ends at 1") {
    val rows = Seq(
      Row(1, 1704067200L, 1, 2, "d", "c1", 1.0),
      Row(2, 1704067201L, 1, 2, "d", "c1", 1.0),
      Row(3, 1704067202L, 1, 2, "d", "c2", 1.0),
      Row(4, 1704067203L, 1, 2, "d", "c3", 1.0))
    val r = Stats.clientRankDist(prepOf(rows)).collect()
      .map(x => (x.getString(0), x.getDouble(2), x.getDouble(3))).toSeq
    // order by client: c1 (cnt 2, highest) pct_rank 1.0; c2 < c3 by tie-break
    assert(r == Seq(("c1", 1.0, 1.0), ("c2", 0.0, 0.333333), ("c3", 0.5, 0.666667)))
  }

  test("inter-arrival means per class (stats.py:382-388)") {
    // Allowed at t=0,10,30 → gaps 10,20 → mean 15; Blocked at t=5,6 → gap 1
    val rows = Seq(
      Row(1, 1704067200L, 1, 2, "d", "c", 1.0),
      Row(2, 1704067210L, 1, 2, "d", "c", 1.0),
      Row(3, 1704067230L, 1, 2, "d", "c", 1.0),
      Row(4, 1704067205L, 1, 1, "d", "c", 1.0),
      Row(5, 1704067206L, 1, 1, "d", "c", 1.0))
    val m = Stats.interArrival(prepOf(rows)).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(m("Allowed") == 15.0 && m("Blocked") == 1.0)
  }

  test("w09: trailing z-score flags the spike day, not the day after it") {
    // 10 days of Allowed traffic; day 8 is a 100-event spike over a
    // baseline that wobbles 8-12 (nonzero variance, so z is defined)
    val perDay = Seq(8, 12, 9, 11, 10, 10, 9, 11, 100, 10)
    val rows = perDay.zipWithIndex.flatMap { case (cnt, day) =>
      (0 until cnt).map(i =>
        Row(day * 1000 + i, 1704067200L + day * 86400L + i, 1, 2, "d", "c", 1.0))
    }
    val out = Stats.dailyAnomalies(prepOf(rows)).collect()
      .filter(_.getString(0) == "Allowed").sortBy(_.getDate(1).getTime)
    assert(out.length == 10)
    // days 0-2: < 3 trailing points → NULL z, never anomalous
    out.take(3).foreach { r =>
      assert(r.isNullAt(4) && !r.getBoolean(5), s"day with thin history flagged: $r")
    }
    // the spike: mean of its 7 preceding ≈ 10.29, z >> 2
    val spike = out(8)
    assert(spike.getLong(2) == 100 && spike.getBoolean(5))
    assert(spike.getDouble(4) > 2.0)
    // the day AFTER the spike is normal: the spike inflates its trailing
    // sd far more than the mean, so |z| stays small — no echo alert
    val after = out(9)
    assert(!after.getBoolean(5) && math.abs(after.getDouble(4)) < 1.0)
    // trailing window excludes the current row: day 8's mean is baseline-
    // scale, untouched by its own 100
    assert(spike.getDouble(3) < 15.0)
  }
}
