package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.operators.{AsofJoin, RangeJoin}

class JoinAlgoSpec extends SparkSpec {

  test("asof: hand-built case — latest right at-or-before each left ts, null before first") {
    val left = df("client STRING, ts TIMESTAMP, id INT", Seq(
      Row("c1", java.sql.Timestamp.valueOf("2024-01-01 00:00:05"), 1),
      Row("c1", java.sql.Timestamp.valueOf("2024-01-01 00:00:20"), 2),
      Row("c2", java.sql.Timestamp.valueOf("2024-01-01 00:00:01"), 3)))
    val right = df("client STRING, ts TIMESTAMP, v STRING", Seq(
      Row("c1", java.sql.Timestamp.valueOf("2024-01-01 00:00:03"), "a"),
      Row("c1", java.sql.Timestamp.valueOf("2024-01-01 00:00:20"), "b"), // ties: <= wins
      Row("c2", java.sql.Timestamp.valueOf("2024-01-01 00:00:09"), "late")))
    val out = AsofJoin.asof(left, right, "client", "ts", Seq("v"))
      .orderBy("id").select("id", "asof_v").collect()
      .map(r => r.getInt(0) -> Option(r.getString(1))).toSeq
    assert(out == Seq(1 -> Some("a"), 2 -> Some("b"), 3 -> None))
  }

  test("binned range join equals the naive range predicate join") {
    val prep = FtlFixture.prep(spark, 11, 800)
    val points = prep.select(col("client"), col("ts"), col("id"))
    // synthetic intervals: each client's sessions widened a bit
    val intervals = graft.operators.Streaks.sessionize(prep, 3600)
      .select(col("client"), col("session_no"),
        col("session_start").as("ivl_start"), col("session_end").as("ivl_end"))
      .filter(col("session_no") % 3 === 0)
    val naive = points.join(intervals,
      points("client") === intervals("client") &&
        col("ts") >= col("ivl_start") && col("ts") <= col("ivl_end"))
      .select(col("id"), col("session_no"))
    val binned = RangeJoin.binned(points, intervals, "client", "ts",
      "ivl_start", "ivl_end", binSeconds = 7200)
      .select(col("id"), col("session_no"))
    assert(binned.count() == naive.count() && naive.count() > 0)
    assert(binned.exceptAll(naive).count() == 0 && naive.exceptAll(binned).count() == 0)
  }
}
