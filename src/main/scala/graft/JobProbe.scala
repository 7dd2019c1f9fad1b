package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import scala.collection.mutable

/** Dev-only forensics: `runMain graft.JobProbe <sfDir> <query>` runs one
  * named SparkEntry query (post-warmup) with a listener that prints each
  * Spark job's wall time and stage breakdown — used to attribute
  * fixed-overhead regressions (job count × scheduling latency vs real
  * task work). Not part of the driver contract. */
object JobProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val name = if (args.length > 1) args(1) else "w02_longest_streaks"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = SparkEntry.queries(name)
    (1 to 3).foreach(_ => fn(spark, sfDir).count()) // warm
    val jobs = mutable.Map.empty[Int, Long]
    val stages = mutable.ArrayBuffer.empty[(Int, String, Long, Int)]
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs(j.jobId) = System.nanoTime()
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        jobs.remove(j.jobId).foreach { t0 =>
          println(f"[job ${j.jobId}] ${(System.nanoTime() - t0) / 1e6}%.1f ms")
        }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val si = s.stageInfo
        val ms = (for (c <- si.completionTime; b <- si.submissionTime) yield c - b).getOrElse(-1L)
        stages += ((si.stageId, si.name.takeWhile(_ != '\n').take(70), ms, si.numTasks))
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    fn(spark, sfDir).count()
    val total = (System.nanoTime() - t0) / 1e9
    Thread.sleep(500) // let the async listener bus drain
    stages.foreach { case (id, n, ms, k) => println(f"[stage $id] $ms ms  tasks=$k  $n") }
    println(f"[total] $name $total%.3f s")
    spark.stop()
  }
}
