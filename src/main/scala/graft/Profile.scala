package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc profiler: `runMain graft.Profile <sfDir> <query> [reps]` times
  * a named SparkEntry query end-to-end over `reps` runs (post-warmup) so
  * optimization work measures the operator, not the JVM. Not part of the
  * driver contract — a development tool like [[Explain]]. */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args(1).split(",").toSeq else Seq("d05_simhash_cands")
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "5000") // match Bench
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    // SPARK_GRAFT_WARM_DIR: run each query once against a (tiny) SF first,
    // so timings isolate data-scale work from one-time codegen/JIT compile
    // (the generated code is identical across SF dirs → compiler cache hits)
    sys.env.get("SPARK_GRAFT_WARM_DIR").foreach { wd =>
      names.foreach(n => try SparkEntry.queries(n)(spark, wd).count()
        catch { case e: Throwable => System.err.println(s"[profile] warm $n: $e") })
    }
    for (name <- names) {
      val fn = SparkEntry.queries(name)
      val times = (0 until reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[profile] $name reps=${times.map(t => f"$t%.3f").mkString(",")} min=${times.min}%.3f")
    }
    spark.stop()
  }
}
