package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: media payloads as opaque `binary` columns
  * with typed metadata, and batch feature extraction over partitions.
  *
  * The decode step is a STUB by design (no image/audio codecs in this
  * environment): payloads are deterministic fake bytes (the doc text's
  * UTF-8) and "decoding" computes structural features (length, checksum,
  * sampled offsets). What is REAL and load-bearing is the Spark shape:
  *   - schema: `media: binary` + `meta: struct<kind,width,height,n_frames>`
  *     — exactly how an image/video column rides in a 100 TB parquet
  *     lake (binary chunk + queryable metadata, scan prunes `media`
  *     unless referenced);
  *   - per-partition batch processing via `mapPartitions` on the typed
  *     Dataset — one decoder init per partition (the expensive part for a
  *     real codec), streaming through rows without materializing the
  *     partition; swap the body for JNI/FFmpeg and nothing else moves;
  *   - frame sampling as index arithmetic on metadata, so a video
  *     pipeline can pick frames BEFORE decoding (predicate on meta, not
  *     payload).
  */
object Multimodal {

  val MediaKinds: Seq[String] = Seq("image", "audio", "video")

  /** Attach a deterministic fake media payload + metadata to each doc.
    * All derivations are pure expressions on (doc_id, text) so the oracle
    * can mirror them. */
  def attachMedia(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("media"),
      struct(
        element_at(
          array(MediaKinds.map(lit): _*), (col("doc_id") % 3 + 1).cast("int")).as("kind"),
        (lit(64) + (col("doc_id") % 16) * 8).cast("int").as("width"),
        (lit(64) + (col("doc_id") % 9) * 8).cast("int").as("height"),
        (col("doc_id") % 30 + 1).cast("int").as("n_frames")
      ).as("meta"))

  /** Metadata-level query — runs WITHOUT touching the binary column
    * (column pruning keeps `media` out of the scan): per-kind counts,
    * payload byte stats from the lightweight length only. */
  def mediaMeta(docs: DataFrame): DataFrame =
    attachMedia(docs)
      .select(col("doc_id"), col("meta.kind").as("kind"),
        col("meta.width").as("width"), col("meta.height").as("height"),
        col("meta.n_frames").as("n_frames"),
        length(col("media")).as("byte_len"))
      .orderBy("doc_id")

  /** Frame-sampling plan: for videos, every k-th frame index up to
    * n_frames — index arithmetic on metadata only; the decoder would seek
    * exactly these. */
  def sampledFrames(docs: DataFrame, every: Int = 5): DataFrame =
    attachMedia(docs)
      .filter(col("meta.kind") === "video")
      .select(col("doc_id"), col("meta.n_frames").as("n_frames"),
        explode(sequence(lit(0), col("meta.n_frames") - 1,
          lit(every))).as("frame_idx"))
      .orderBy("doc_id", "frame_idx")

  private val resizedSchema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = true),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("target_w", IntegerType, nullable = false),
    StructField("target_h", IntegerType, nullable = false),
    StructField("stride", IntegerType, nullable = false),
    StructField("resized_len", IntegerType, nullable = false),
    StructField("resized_checksum", LongType, nullable = false)))

  /** The resize stage of an image pipeline: fit (width, height) into a
    * `box`×`box` target preserving aspect ratio, then "resample" the
    * payload by pixel-decimation stride. The geometry and the stride are
    * pure integer arithmetic (oracle-mirrorable); the byte decimation
    * stands in for the codec's scaler. Same mapPartitions shape as
    * [[extractFeatures]] — a real scaler initializes once per partition
    * and only the body of `resize` changes. */
  def resizeMedia(docs: DataFrame, box: Int = 64): DataFrame = {
    val spark = docs.sparkSession
    val src = attachMedia(docs).select(col("doc_id"), col("media"),
      col("meta.kind"), col("meta.width"), col("meta.height"))
    val rdd = src.rdd.mapPartitions { rows =>
      // real pipeline: val scaler = Codec.acquireScaler() here, once per partition
      def resize(r: Row): Row = {
        val id    = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val kind  = r.getString(2)
        val w     = r.getInt(3)
        val h     = r.getInt(4)
        val m  = math.max(w, h)
        val tw = math.max(1, w * box / m)
        val th = math.max(1, h * box / m)
        val stride = math.max(1, (w.toLong * h / (tw.toLong * th)).toInt)
        var sum = 0L
        var n   = 0
        var i   = 0
        while (i < bytes.length) { sum += (bytes(i) & 0xff); n += 1; i += stride }
        Row(id, kind, w, h, tw, th, stride, n, sum % 1000000007L)
      }
      rows.map(resize)
    }
    spark.createDataFrame(rdd, resizedSchema).orderBy("doc_id")
  }

  private val featureSchema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = true),
    StructField("byte_len", IntegerType, nullable = false),
    StructField("checksum", LongType, nullable = false),
    StructField("head_byte", IntegerType, nullable = false),
    StructField("tail_byte", IntegerType, nullable = false)))

  /** The decode/feature-extract stage: mapPartitions so a real decoder
    * initializes once per partition. The stub computes deterministic
    * structural features; a real implementation replaces only the body of
    * `extract`. Oracle-checked: the DuckDB side reproduces the byte walk
    * over hex(encode(text)) (m02 in Oracles.multimodal); ScalaTest
    * additionally pins exact values. */
  def extractFeatures(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    val withMedia = attachMedia(docs).select("doc_id", "media", "meta.kind")
    val rdd = withMedia.rdd.mapPartitions { rows =>
      // real pipeline: val decoder = Codec.acquire() here, once per partition
      def extract(r: Row): Row = {
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val kind = r.getString(2)
        var sum = 0L
        var i = 0
        while (i < bytes.length) { sum += (bytes(i) & 0xff); i += 1 }
        Row(id, kind, bytes.length, sum % 1000000007L,
          if (bytes.nonEmpty) bytes(0) & 0xff else -1,
          if (bytes.nonEmpty) bytes(bytes.length - 1) & 0xff else -1)
      }
      rows.map(extract)
    }
    spark.createDataFrame(rdd, featureSchema).orderBy("doc_id")
  }
}
