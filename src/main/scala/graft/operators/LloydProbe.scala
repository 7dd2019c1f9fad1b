package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-15 measurement probe for the Lloyd-iteration assignment shapes
  * in kmeansCentroids / pqCodebooks (crossJoin+window vs in-row argmin).
  *
  * The training loops are driver-side (centroids collect back between
  * iterations), so no DECLARED query's printed plan contains the
  * assignment subplan — this probe is the committed evidence instead.
  *
  * Outcome recorded here and in OPTIMIZATION_r15.md: the IVF loop's
  * in-row assignment ([[Similarity.lloydAssignIvf]]) was ADOPTED (its
  * old form crossJoined the whole corpus k× with 64-dim payloads); the
  * PQ loop's in-row form ([[pqAssignInrow]] below) was measured and NOT
  * adopted — its old join fans out on the SUBSPACE key only, and the
  * in-row form's fresh-literal re-plan/JIT warm (~0.4 s/iteration,
  * `diag3`) dwarfs its exec win on a 2000-row training set.
  *
  * Modes:
  *   `plans <outDir>` — `.explain("formatted")` of one iteration's
  *     assignment in both forms for both trainings, plus per-cell
  *     assignment-histogram equality checks.
  *   `time [reps] [ab|ba]` — full-training A/B in ONE JVM
  *     (releaseCaches between reps so every rep retrains): form
  *     `inrow` = in-row assignment (kmeans: the production
  *     kmeansCentroids; pq: the candidate loop below), form `joinwin` =
  *     join+window (kmeans: reconstructed r14 loop; pq: the production
  *     pqCodebooks). `ab` runs inrow first within each rep, `ba` the
  *     reverse — run both orders; JIT warm favors whichever runs later.
  *   `diag` — three fixed-literal runs per assignment form: first-vs-
  *     steady gap isolates plan/codegen warm from per-row cost.
  *   `diag3` — per-run PERTURBED centroid literals: measures what a
  *     fresh-literal re-plan actually costs (the Lloyd loop's regime).
  */
object LloydProbe {
  private def session(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark
  }

  // ── join+window per-iteration assignments (the r14 forms) ──

  private def ivfAssignOld(vecs: DataFrame, cents: DataFrame): DataFrame = {
    val dot = Similarity.dot _
    val w = Window.partitionBy("vec_id").orderBy(asc("dist2"), asc("cell"))
    vecs.join(broadcast(cents), expr("true"))
      .select(col("vec_id"), col("v"), col("cell"),
        (dot(col("v"), col("v")) - lit(2.0) * dot(col("v"), col("centv"))
          + dot(col("centv"), col("centv"))).as("dist2"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("v"), col("cell"))
  }

  private def pqAssignOld(vecs: DataFrame, cents: DataFrame): DataFrame = {
    val dot = Similarity.dot _
    val w = Window.partitionBy("vec_id", "subspace").orderBy(asc("dist2"), asc("cell"))
    vecs.join(broadcast(cents), Seq("subspace"))
      .select(col("vec_id"), col("subspace"), col("v"), col("cell"),
        (dot(col("v"), col("v")) - lit(2.0) * dot(col("v"), col("centv"))
          + dot(col("centv"), col("centv"))).as("dist2"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("subspace"), col("cell"), col("v"))
  }

  // ── the PQ in-row candidate (measured, NOT adopted — kept verbatim so
  //    the A/B stays reproducible) ──

  private def pqAssignInrow(emb: DataFrame, centRows: Seq[(Int, Int, Seq[Double])],
                            sub: Int): DataFrame = {
    val dot = Similarity.dot _
    val bySub: Seq[(Int, Seq[(Int, Seq[Double])])] = centRows
      .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3)).sortBy(_._1))
      .toSeq.sortBy(_._1)
    val sliced = emb.select(col("vec_id") +: bySub.map { case (i, _) =>
      transform(slice(col("embedding"), i * sub + 1, sub),
        x => x.cast("double")).as(s"_dv$i") }: _*)
    val assignStructs = bySub.map { case (i, entries) =>
      val dv = col(s"_dv$i")
      val dists = entries.map { case (_, cv) =>
        dot(dv, dv) - lit(2.0) * dot(dv, lit(cv.toArray)) + lit(Similarity.selfDot(cv))
      }
      struct(lit(i).as("subspace"),
        Similarity.argminCell(dists, entries.map(_._1)).as("cell"), dv.as("v"))
    }
    sliced.select(explode(array(assignStructs: _*)).as("s"))
      .select(col("s.subspace").as("subspace"), col("s.cell").as("cell"),
        col("s.v").as("v"))
  }

  // ── full trainings from each assignment (same init + mean update) ──

  private def kmeansOld(vecs: DataFrame, k: Int, iterations: Int): Seq[(Int, Seq[Double])] = {
    val spark = vecs.sparkSession
    import spark.implicits._
    var centRows: Array[(Int, Seq[Double])] = vecs.filter(col("vec_id") < k)
      .select(col("vec_id").cast("int").as("cell"), col("v").as("centv"))
      .as[(Int, Seq[Double])].collect().sortBy(_._1)
    for (_ <- 0 until iterations if centRows.nonEmpty) {
      val assigned = ivfAssignOld(vecs, centRows.toSeq.toDF("cell", "centv"))
      val recomputed = assigned
        .select(col("cell"), posexplode(col("v")).as(Seq("dim", "x")))
        .groupBy("cell", "dim").agg(avg(col("x")).as("mx"))
        .groupBy("cell").agg(
          array_sort(collect_list(struct(col("dim"), col("mx")))).as("pairs"))
        .select(col("cell"),
          transform(col("pairs"), p => p.getField("mx")).as("centv"))
      val next = recomputed.as[(Int, Seq[Double])].collect().toMap
      centRows = centRows.map { case (cell, prev) => (cell, next.getOrElse(cell, prev)) }
    }
    centRows.toSeq
  }

  private def pqBooksInrow(emb: DataFrame, vecsPq: DataFrame, codes: Int, sub: Int,
                           iterations: Int): Seq[(Int, Int, Seq[Double])] = {
    val spark = emb.sparkSession
    import spark.implicits._
    var centRows: Array[(Int, Int, Seq[Double])] = vecsPq.filter(col("vec_id") < codes)
      .select(col("subspace"), col("vec_id").cast("int").as("cell"), col("v"))
      .as[(Int, Int, Seq[Double])].collect().sortBy(t => (t._1, t._2))
    for (_ <- 0 until iterations if centRows.nonEmpty) {
      val assigned = pqAssignInrow(emb, centRows.toSeq, sub)
      val recomputed = assigned
        .select(col("subspace"), col("cell"), posexplode(col("v")).as(Seq("dim", "x")))
        .groupBy("subspace", "cell", "dim").agg(avg(col("x")).as("mx"))
        .groupBy("subspace", "cell").agg(
          array_sort(collect_list(struct(col("dim"), col("mx")))).as("pairs"))
        .select(col("subspace"), col("cell"),
          transform(col("pairs"), p => p.getField("mx")).as("centv"))
      val next = recomputed.as[(Int, Int, Seq[Double])].collect()
        .map(t => (t._1, t._2) -> t._3).toMap
      centRows = centRows.map { case (s, c, prev) => (s, c, next.getOrElse((s, c), prev)) }
    }
    centRows.toSeq
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val mode = args(1)
    val spark = session()
    import spark.implicits._
    val emb = graft.Tables.embeddings(spark, sfDir)
    val vecsIvf = emb.select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("v"))
    val k = 16
    val centRowsIvf: Seq[(Int, Seq[Double])] = vecsIvf.filter(col("vec_id") < k)
      .select(col("vec_id").cast("int").as("cell"), col("v").as("centv"))
      .as[(Int, Seq[Double])].collect().sortBy(_._1).toSeq
    val m = 4; val codes = 16
    val sub = Similarity.embeddingDim(emb) / m
    val subs = array((0 until m).map(i => struct(lit(i).as("subspace"),
      slice(col("embedding"), i * sub + 1, sub).as("sv"))): _*)
    val vecsPq = emb.select(col("vec_id"), explode(subs).as("s"))
      .select(col("vec_id"), col("s.subspace").as("subspace"),
        transform(col("s.sv"), x => x.cast("double")).as("v"))
    val centRowsPq: Seq[(Int, Int, Seq[Double])] = vecsPq.filter(col("vec_id") < codes)
      .select(col("subspace"), col("vec_id").cast("int").as("cell"), col("v"))
      .as[(Int, Int, Seq[Double])].collect().sortBy(t => (t._1, t._2)).toSeq

    mode match {
      case "plans" =>
        val outDir = args(2)
        new java.io.File(outDir).mkdirs()
        def dump(name: String, df: DataFrame): Unit =
          java.nio.file.Files.writeString(
            java.nio.file.Paths.get(s"$outDir/$name.txt"),
            df.queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode))
        dump("kmeans_lloyd_assign_before",
          ivfAssignOld(vecsIvf, centRowsIvf.toDF("cell", "centv")))
        dump("kmeans_lloyd_assign_after",
          Similarity.lloydAssignIvf(vecsIvf, centRowsIvf))
        dump("pq_lloyd_assign_joinwin",
          pqAssignOld(vecsPq, centRowsPq.toDF("subspace", "cell", "centv")))
        dump("pq_lloyd_assign_inrow_rejected",
          pqAssignInrow(emb, centRowsPq, sub))
        println(s"plans written to $outDir")
        // row-level equivalence spot check: per-cell assignment histograms
        val oldC = ivfAssignOld(vecsIvf, centRowsIvf.toDF("cell", "centv"))
          .groupBy("cell").count().collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
        val newC = Similarity.lloydAssignIvf(vecsIvf, centRowsIvf)
          .groupBy("cell").count().collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
        val oldP = pqAssignOld(vecsPq, centRowsPq.toDF("subspace", "cell", "centv"))
          .groupBy("subspace", "cell").count().collect()
          .map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2))).sortBy(_._1)
        val newP = pqAssignInrow(emb, centRowsPq, sub)
          .groupBy("subspace", "cell").count().collect()
          .map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2))).sortBy(_._1)
        println(s"ivf assign equal: ${oldC.sameElements(newC)} (${oldC.length} cells)")
        println(s"pq  assign equal: ${oldP.sameElements(newP)} (${oldP.length} (sub,cell) pairs)")
      case "diag" =>
        def t(label: String, mk: () => DataFrame): Unit = {
          for (i <- 1 to 3) {
            val t0 = System.nanoTime()
            mk().write.format("noop").mode("overwrite").save()
            println(f"$label run $i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
          }
        }
        t("pq_joinwin", () => pqAssignOld(vecsPq, centRowsPq.toDF("subspace", "cell", "centv")))
        t("pq_inrow", () => pqAssignInrow(emb, centRowsPq, sub))
        t("kmeans_joinwin", () => ivfAssignOld(vecsIvf, centRowsIvf.toDF("cell", "centv")))
        t("kmeans_inrow", () => Similarity.lloydAssignIvf(vecsIvf, centRowsIvf))
      case "diag3" =>
        for (i <- 1 to 4) {
          val cr = centRowsIvf.map { case (c, v) => (c, v.map(_ + i * 1e-9)) }
          val t0 = System.nanoTime()
          Similarity.lloydAssignIvf(vecsIvf, cr).write.format("noop").mode("overwrite").save()
          println(f"km_inrow perturbed run $i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
        }
        for (i <- 1 to 4) {
          val cr = centRowsPq.map { case (s, c, v) => (s, c, v.map(_ + i * 1e-9)) }
          val t0 = System.nanoTime()
          pqAssignInrow(emb, cr, sub).write.format("noop").mode("overwrite").save()
          println(f"pq_inrow perturbed run $i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
        }
      case "time" =>
        val reps = if (args.length > 2) args(2).toInt else 3
        val forms = if (args.length > 3 && args(3) == "ba") Seq("joinwin", "inrow")
                    else Seq("inrow", "joinwin")
        for (r <- 1 to reps; form <- forms) {
          Similarity.releaseCaches()
          var t0 = System.nanoTime()
          val kmRows =
            if (form == "joinwin") kmeansOld(vecsIvf, k, 2).length
            else Similarity.kmeansCentroids(emb, k, 2).count()
          val tk = (System.nanoTime() - t0) / 1e9
          t0 = System.nanoTime()
          val pqRows =
            if (form == "joinwin") Similarity.pqCodebooks(emb, m, codes, 2).count()
            else pqBooksInrow(emb, vecsPq, codes, sub, 2).length
          val tp = (System.nanoTime() - t0) / 1e9
          println(f"rep $r form=$form kmeans=${tk}%.3f s ($kmRows rows) pq=${tp}%.3f s ($pqRows rows)")
        }
    }
    spark.stop()
  }
}
