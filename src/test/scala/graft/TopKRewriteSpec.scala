package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The rank-window → heap-aggregate optimizer rule: fires exactly on the
  * provably-equivalent pattern, never otherwise. */
class TopKRewriteSpec extends SparkSpec {

  /** True iff the optimized plan still contains the Window NODE (the
    * rewrite's target). Spark's InferWindowGroupLimit may leave a
    * WindowGroupLimit pre-filter below our aggregate — that node keeps
    * exactly the rows that can rank <= k, so it composes with the heap
    * (a map-side pre-limit), and a string match on "Window" would
    * misread it. */
  private def hasWindowNode(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }.nonEmpty

  graft.functions.GraftExtensions.registerAll(spark)

  // non-nullable (g, s, id) via primitive tuples — the shape the rule accepts
  private def frame(): DataFrame = {
    import spark.implicits._
    val rows = for (g <- 0L until 5L; i <- 0L until 40L)
      yield (g, ((g * 31 + i * 17) % 100).toDouble / 10.0, i)
    rows.toDF("g", "s", "id")
  }

  private def windowTopK(df: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("g").orderBy(desc("s"), asc("id"))
    df.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  test("rewrites the exact pattern: no Window in the plan, aggregate + explode instead") {
    val out = windowTopK(frame(), 3)
    val optimized = out.queryExecution.optimizedPlan.toString
    assert(!hasWindowNode(out), optimized)
    assert(optimized.contains("topk_by_score"), optimized)
    assert(optimized.contains("posexplode"), optimized)
  }

  test("rewritten plan returns exactly the window form's rows") {
    val df = frame()
    // expected: compute with the rule DISABLED by breaking the pattern
    // (extra column) then dropping it — the window path untouched
    val viaWindow = windowTopK(df.withColumn("extra", lit(1)), 3).drop("extra")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getInt(3))).toSet
    val viaRule = windowTopK(df, 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getInt(3))).toSet
    assert(viaRule == viaWindow && viaRule.nonEmpty)
    // every group has exactly k rows, ranks 1..k, scores non-increasing
    viaRule.groupBy(_._1).values.foreach { rows =>
      val sorted = rows.toSeq.sortBy(_._4)
      assert(sorted.map(_._4) == (1 to 3))
      val scores = sorted.map(_._2)
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    }
  }

  test("downstream operators above the filter still resolve (exprIds restored)") {
    val out = windowTopK(frame(), 2)
      .groupBy("g").agg(sum("s").as("top2_sum"), max("rank").as("max_rank"))
      .orderBy("g")
    val rows = out.collect()
    assert(rows.length == 5 && rows.forall(_.getInt(2) == 2))
  }

  test("guards: nullable score, extra columns, wrong direction, other ranks stay windowed") {
    val df = frame()
    // nullable score (when() introduces nullability) — not provably equal
    val nullable = df.withColumn("s", when(col("id") >= 0, col("s")))
    assert(hasWindowNode(windowTopK(nullable, 3)))
    // extra payload column — the heap cannot carry it
    assert(hasWindowNode(windowTopK(df.withColumn("payload", lit("x")), 3)))
    // ascending score — different semantics
    val wAsc = Window.partitionBy("g").orderBy(asc("s"), asc("id"))
    assert(hasWindowNode(
      df.withColumn("rank", row_number().over(wAsc)).filter(col("rank") <= 3)))
    // rank() instead of row_number() — tie semantics differ
    val w = Window.partitionBy("g").orderBy(desc("s"), asc("id"))
    assert(hasWindowNode(
      df.withColumn("rank", rank().over(w)).filter(col("rank") <= 3)))
  }

  test("duplicate rows: exactly one of the capacity-edge duplicates survives, like row_number") {
    import spark.implicits._
    val dup = Seq((1L, 5.0, 10L), (1L, 5.0, 10L), (1L, 9.0, 1L))
      .toDF("g", "s", "id")
    val out = windowTopK(dup, 2)
    assert(!hasWindowNode(out))
    val rows = out.collect().map(r => (r.getDouble(1), r.getLong(2), r.getInt(3))).toSet
    assert(rows == Set((9.0, 1L, 1), (5.0, 10L, 2)))
  }
}
