package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import scala.util.Random

/** Scala port of the reference's fixture generator
  * (reference: tests/conftest.py:18-88): seeded, timestamps linspace over
  * a window, status uniform over the 18 allowed∪blocked codes, domain
  * names encoding their class, 5 clients, reply_time U(0,50). */
object FtlFixture {

  val AllowedCodes: Seq[Int] = Preprocess.AllowedStatuses
  val BlockedCodes: Seq[Int] = Preprocess.BlockedStatuses
  val Clients: Seq[String] = (2 to 6).map(i => s"192.168.1.$i")

  val Schema: StructType = StructType(Seq(
    StructField("id", IntegerType), StructField("timestamp", LongType),
    StructField("type", IntegerType), StructField("status", IntegerType),
    StructField("domain", StringType), StructField("client", StringType),
    StructField("reply_time", DoubleType)))

  /** Rows spanning [start, end] like numpy linspace (inclusive ends). */
  def rows(seed: Int, n: Int,
           startEpoch: Long = 1704067200L, // 2024-01-01
           endEpoch: Long = 1706659200L): Seq[Row] = {
    val rnd = new Random(seed)
    val all = AllowedCodes ++ BlockedCodes
    (0 until n).map { i =>
      val ts = if (n == 1) startEpoch
        else startEpoch + (endEpoch - startEpoch) * i / (n - 1)
      val status = all(rnd.nextInt(all.size))
      val cls = if (AllowedCodes.contains(status)) "alloweddomain" else "blockeddomain"
      Row(i + 1, ts, 1 + rnd.nextInt(16), status,
        s"www.$cls${seed}_${1 + rnd.nextInt(10)}.com",
        Clients(rnd.nextInt(Clients.size)),
        rnd.nextDouble() * 50)
    }
  }

  def frame(spark: SparkSession, seed: Int, n: Int): DataFrame = {
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(rows(seed, n).asJava, Schema)
  }

  /** The canonical preprocessed relation over a fixture frame. */
  def prep(spark: SparkSession, seed: Int = 1, n: Int = 2000): DataFrame =
    Preprocess.preprocessFtl(frame(spark, seed, n))
}
