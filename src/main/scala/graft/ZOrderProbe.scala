package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.ZOrder

/** Measures the FILE-SKIP ratio of the z-order write path against a
  * linear sort on real event rows — the evidence row SCALE.md cites for
  * the storage-layout section. StorageSpec pins the layout property on
  * synthetic grids; this probe puts numbers on the driver-visible table
  * (events, the reference's FTL log) at bench scale:
  *
  *   - layout `linear`: `repartitionByRange(16, ts)` + sort — the layout
  *     a date-partitioned log naturally has; prunes ts slices only.
  *   - layout `z`: `ZOrder.writeZOrderedN(ts, user_id)` — the curve
  *     layout; prunes slices on EITHER dimension.
  *
  * "Files touched" = files still carrying matching rows after the slice
  * predicate — exactly the files a footer-min/max-pruning reader cannot
  * skip (the same metric StorageSpec asserts on). Slices are ~5% of the
  * span on each dimension, taken mid-domain so edge files don't flatter
  * either layout. Prints one JSON line; runMain graft.ZOrderProbe
  * [eventsDir] (default /root/testdata/sf0.1).
  */
object ZOrderProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = if (args.length > 1) args(1) else "/tmp/graft_zprobe"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val ev = Tables.events(spark, dir)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"))
    val n = ev.count()

    def timed[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = body
      (a, (System.nanoTime() - t0) / 1e9)
    }
    val (_, tLin) = timed {
      ev.repartitionByRange(16, col("ts")).sortWithinPartitions("ts")
        .write.mode("overwrite").parquet(s"$out/linear")
    }
    val (_, tZ) = timed(ZOrder.writeZOrderedN(ev, s"$out/z", Seq("ts", "user_id")))

    // ~5% slices on each dimension at five centers across the domain —
    // a single mid-domain slice would sit exactly on the 0.5 curve-cell
    // boundary (the worst alignment for the quadrant grid) and a single
    // edge slice the best; the MEAN over spread centers is the number a
    // mixed query workload actually sees.
    val centers = Seq(0.15, 0.3, 0.5, 0.7, 0.85)
    val probs = centers.flatMap(c => Seq(c - 0.025, c + 0.025)).toArray
    val Array(q: Array[Double], u: Array[Double]) = ev
      .select(unix_micros(col("ts")).cast("double").as("tsu"),
        col("user_id").cast("double").as("uid"))
      .stat.approxQuantile(Array("tsu", "uid"), probs, 0.001).map(identity)
    def slices(cuts: Array[Double], c: Column): Seq[Column] =
      centers.indices.map(i => c.between(cuts(2 * i), cuts(2 * i + 1)))
    val tsSlices = slices(q, unix_micros(col("ts")))
    val uidSlices = slices(u, col("user_id"))

    def files(path: String): Long =
      spark.read.parquet(path).select(input_file_name()).distinct().count()
    def touched(path: String, pred: Column): Long =
      spark.read.parquet(path).filter(pred)
        .select(input_file_name()).distinct().count()
    def mean(path: String, ps: Seq[Column]): Double =
      ps.map(touched(path, _)).sum.toDouble / ps.size

    val fz = files(s"$out/z"); val fl = files(s"$out/linear")
    val bothSlices = tsSlices.zip(uidSlices).map { case (a, b) => a && b }
    val r = Map(
      "rows" -> n,
      "files_z" -> fz, "files_linear" -> fl,
      "ts_z" -> mean(s"$out/z", tsSlices),
      "ts_linear" -> mean(s"$out/linear", tsSlices),
      "uid_z" -> mean(s"$out/z", uidSlices),
      "uid_linear" -> mean(s"$out/linear", uidSlices),
      "both_z" -> mean(s"$out/z", bothSlices),
      "both_linear" -> mean(s"$out/linear", bothSlices))
    val times = Map("write_linear_sec" -> tLin, "write_z_sec" -> tZ)
    println(
      (r.toSeq.sortBy(_._1).map { case (k, v) => s""""$k":$v""" } ++
        times.toSeq.sortBy(_._1).map { case (k, v) => f""""$k":$v%.2f""" })
        .mkString("{", ",", s""","dir":"$dir"}"""))
    spark.stop()
  }
}
