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

  test("resize: aspect-preserving box fit + stride decimation, exact stub values") {
    val r = Multimodal.resizeMedia(docs).collect()
      .map(r => r.getLong(0) -> ((r.getInt(4), r.getInt(5), r.getInt(6), r.getInt(7), r.getLong(8)))).toMap
    // doc 0: w=h=64 → box fit 64×64, stride = 1 → every byte kept
    val b0 = "hello world".getBytes("UTF-8")
    assert(r(0L) == ((64, 64, 1, b0.length, b0.map(_ & 0xff).map(_.toLong).sum % 1000000007L)))
    // doc 5: w=h=104 → 64×64, stride = floor(104*104/(64*64)) = 2 → every 2nd byte
    val b5 = "video doc".getBytes("UTF-8")
    val kept = b5.indices.filter(_ % 2 == 0).map(b5(_) & 0xff)
    assert(r(5L) == ((64, 64, 2, kept.length, kept.map(_.toLong).sum % 1000000007L)))
    // doc 2: empty payload → zero resized bytes, zero checksum
    assert(r(2L)._4 == 0 && r(2L)._5 == 0L)
    // target box never exceeded, never degenerate
    Multimodal.resizeMedia(docs).collect().foreach { row =>
      assert(row.getInt(4) >= 1 && row.getInt(4) <= 64)
      assert(row.getInt(5) >= 1 && row.getInt(5) <= 64)
    }
  }

  test("metadata query prunes the binary column from the scan") {
    val plan = Multimodal.mediaMeta(docs).queryExecution.optimizedPlan.toString
    // the pruned projection should not carry the media bytes through the agg
    assert(!plan.contains("media#") || plan.contains("length"))
  }
}
