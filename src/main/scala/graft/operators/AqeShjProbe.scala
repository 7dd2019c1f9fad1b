package graft.operators

import org.apache.spark.sql.SparkSession

/** Round-15 probe (VERDICT item 5): same-JVM A/B of AQE's runtime
  * SMJ→SHJ conversion (`spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold`)
  * on the big×big h-family joins. The conf is a runtime SQL conf, so one
  * JVM toggles it per leg — interleaved within each rep, run both orders
  * (`ab` = on first, `ba` = off first).
  *
  * Usage: AqeShjProbe <sfDir> [reps] [ab|ba] [query,query,...]
  */
object AqeShjProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val forms = if (args.length > 2 && args(2) == "ba") Seq("off", "on")
                else Seq("on", "off")
    val names = if (args.length > 3) args(3).split(",").toSeq
                else Seq("h02_min_cost_supplier", "h08_market_share", "h10_returned_revenue")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // warm both conf states so codegen/JIT is compiled for each plan shape
    for (form <- Seq("on", "off"); n <- names) {
      spark.conf.set("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
        if (form == "on") "128m" else "0")
      try graft.SparkEntry.queries(n)(spark, "/root/testdata/sf0.001").count()
      catch { case _: Throwable => () }
    }
    for (r <- 1 to reps; form <- forms) {
      spark.conf.set("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
        if (form == "on") "128m" else "0")
      for (n <- names) {
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(n)(spark, sfDir).count()
        println(f"rep $r form=$form $n=${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }
    spark.stop()
  }
}
