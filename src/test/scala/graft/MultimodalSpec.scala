package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {

  private val docs = df("doc_id BIGINT, text STRING", Seq(
    Row(0L, "hello world"), Row(1L, "abc"), Row(2L, ""), Row(5L, "video doc")))

  test("media schema: binary payload + typed metadata struct") {
    val m = Multimodal.attachMedia(docs)
    val f = m.schema("media")
    assert(f.dataType.typeName == "binary")
    val meta = m.schema("meta").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(meta.fieldNames.toSeq == Seq("kind", "width", "height", "n_frames"))
  }

  test("metadata derivations are deterministic in doc_id") {
    val r = Multimodal.mediaMeta(docs).collect().map(r =>
      r.getLong(0) -> (r.getString(1), r.getInt(2), r.getInt(3), r.getInt(4))).toMap
    assert(r(0L) == (("image", 64, 64, 1)))
    assert(r(1L) == (("audio", 72, 72, 2)))
    assert(r(2L) == (("video", 80, 80, 3)))
    assert(r(5L) == (("video", 104, 104, 6)))
  }

  test("feature extraction: exact stub values through mapPartitions") {
    val feats = Multimodal.extractFeatures(docs).collect()
      .map(r => r.getLong(0) -> ((r.getInt(2), r.getLong(3), r.getInt(4), r.getInt(5)))).toMap
    val bytes = "hello world".getBytes("UTF-8")
    assert(feats(0L) == ((bytes.length, bytes.map(_ & 0xff).map(_.toLong).sum % 1000000007L,
      'h'.toInt, 'd'.toInt)))
    assert(feats(2L) == ((0, 0L, -1, -1))) // empty payload
  }

  test("frame sampling: every 5th index within n_frames, videos only") {
    val fr = Multimodal.sampledFrames(docs, every = 5).collect()
      .map(r => (r.getLong(0), r.getInt(2)))
    assert(fr.forall { case (id, _) => id % 3 == 2 }) // only kind=video ids
    assert(fr.filter(_._1 == 5L).map(_._2).toSeq == Seq(0, 5)) // n_frames=6 → 0,5
  }

  test("metadata query prunes the binary column from the scan") {
    val plan = Multimodal.mediaMeta(docs).queryExecution.optimizedPlan.toString
    // the pruned projection should not carry the media bytes through the agg
    assert(!plan.contains("media#") || plan.contains("length"))
  }
}
