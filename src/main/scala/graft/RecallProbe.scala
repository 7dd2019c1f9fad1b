package graft

import org.apache.spark.sql.SparkSession

/** ANN accuracy probe: recall@k of each approximate kNN variant against
  * the s01 brute-force ground truth, on the same embeddings table the
  * bench times. Prints one line per variant (recall + min-of-reps
  * seconds) — the source of SCALE.md's recall table, so the
  * accuracy-for-speed trades the code comments claim are ON THE RECORD
  * rather than asserted. Usage:
  *   runMain graft.RecallProbe [sfDir] [reps]
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    import org.apache.spark.sql.DataFrame
    def query(name: String): () => DataFrame =
      () => SparkEntry.queries(name)(spark, sfDir)
    // s02's front door defaulted to multiprobe in round 10; the
    // single-probe floor stays on the record via a direct call so the
    // recall table still shows both sides of the default change
    val variants: Seq[(String, () => DataFrame)] = Seq(
      "s02_knn_lsh" -> query("s02_knn_lsh"),
      "knn_lsh_single_probe_floor" -> (() =>
        graft.operators.Similarity.knnLshSingleProbe(
          Tables.embeddings(spark, sfDir), 5, 10, planes = 4)),
      "s06_knn_lsh_multiprobe" -> query("s06_knn_lsh_multiprobe"),
      "knn_lsh_multiprobe_r2" -> (() =>
        graft.operators.Similarity.knnLshMultiprobe(
          Tables.embeddings(spark, sfDir), 5, 10, planes = 4, radius = 2)),
      "s04_knn_ivf" -> query("s04_knn_ivf"),
      "s05_knn_ivf_trained" -> query("s05_knn_ivf_trained"),
      "s08_knn_pq" -> query("s08_knn_pq"))
    def neighborsOf(df: DataFrame): Map[Long, Set[Long]] =
      df.select("query_id", "neighbor_id").collect()
        .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    val truth = neighborsOf(SparkEntry.queries("s01_knn_brute")(spark, sfDir))
    val k = truth.values.map(_.size).max
    for ((name, mk) <- variants) {
      val approx = neighborsOf(mk())
      // recall@k averaged over queries; a query missing from the approx
      // result (empty bucket) counts 0, not skipped
      val recall = truth.map { case (q, t) =>
        approx.getOrElse(q, Set.empty).intersect(t).size.toDouble / t.size
      }.sum / truth.size
      val secs = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        mk().count()
        (System.nanoTime() - t0) / 1e9
      }.min
      println(f"""{"probe":"recall","variant":"$name","recall_at_$k":${math.round(recall * 10000) / 10000.0},"sec":${math.round(secs * 1000) / 1000.0},"sf":"$sfDir"}""")
    }
    spark.stop()
  }
}
