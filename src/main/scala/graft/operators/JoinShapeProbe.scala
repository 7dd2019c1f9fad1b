package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-15 probe: same-JVM A/B of the h21 (TPC-H Q21 shape) rewrite —
  * the r14 semi+anti join form (reconstructed verbatim below) vs the
  * per-order-counts aggregate form shipped in
  * [[Joins.soleReturnedSupplier]]. Both legs run in ONE JVM, interleaved
  * (`ab` = new first within each rep, `ba` = old first) — run both
  * orders; JIT warm favors whichever leg runs later.
  *
  * Usage: JoinShapeProbe <sfDir> [reps] [ab|ba]
  */
object JoinShapeProbe {
  private def oldSole(s: SparkSession, dir: String, n: Int = 10): DataFrame = {
    val fOrders = graft.Tables.orders(s, dir)
      .filter(col("o_orderstatus") === "F").select("o_orderkey")
    val lf = graft.Tables.lineitem(s, dir).select("l_orderkey", "l_suppkey", "l_returnflag")
      .join(fOrders, col("l_orderkey") === col("o_orderkey")).drop("o_orderkey")
    val r = lf.filter(col("l_returnflag") === "R").select("l_orderkey", "l_suppkey")
    val others = lf.select(col("l_orderkey").as("x_orderkey"), col("l_suppkey").as("x_suppkey"))
    val rOthers = r.select(col("l_orderkey").as("y_orderkey"), col("l_suppkey").as("y_suppkey"))
    val sole = r
      .join(others, col("l_orderkey") === col("x_orderkey") &&
        col("l_suppkey") =!= col("x_suppkey"), "left_semi")
      .join(rOthers, col("l_orderkey") === col("y_orderkey") &&
        col("l_suppkey") =!= col("y_suppkey"), "left_anti")
    sole.groupBy("l_suppkey").agg(countDistinct("l_orderkey").as("numwait"))
      .join(broadcast(graft.Tables.supplier(s, dir)), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_name"), col("numwait"))
      .orderBy(desc("numwait"), asc("s_name")).limit(n)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val forms = if (args.length > 2 && args(2) == "ba") Seq("old", "new")
                else Seq("new", "old")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // result equality first (multisets of output rows)
    val a = oldSole(spark, sfDir).collect().map(_.toSeq).toSeq
    val b = Joins.soleReturnedSupplier(spark, sfDir).collect().map(_.toSeq).toSeq
    println(s"h21 results equal: ${a == b} (${a.size} rows)")
    for (r <- 1 to reps; form <- forms) {
      val t0 = System.nanoTime()
      val df = if (form == "old") oldSole(spark, sfDir)
               else Joins.soleReturnedSupplier(spark, sfDir)
      df.write.format("noop").mode("overwrite").save()
      println(f"rep $r form=$form h21=${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
