package graft

import org.apache.spark.sql.Row
import graft.operators.Packing

class PackingSpec extends SparkSpec {

  // deterministic texts with known ws-token counts (split-on-space): the
  // token count of "a b c" is 3, of "" is 1 (split yields [""])
  private def doc(id: Long, nTokens: Int): Row =
    Row(id, Seq.fill(math.max(nTokens, 1))("w").mkString(" "))

  private val docs = df("doc_id BIGINT, text STRING",
    Seq(doc(0, 5), doc(1, 3), doc(2, 10), doc(3, 1), doc(4, 7), doc(7, 2)))

  test("window spec: bin assignment follows the exclusive cumsum") {
    // capacity 8: offsets 0,5,8,18,19,26 → bins 0,0,1,2,2,3
    val r = Packing.packSequencesWindow(docs, capacity = 8).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(r(0L) == ((0L, 0L, 1L)))
    assert(r(1L) == ((0L, 5L, 1L)))  // tokens 5..7 fit bin 0 exactly
    assert(r(2L) == ((1L, 0L, 2L)))  // 10 tokens from offset 8 → bins 1,2
    assert(r(3L) == ((2L, 2L, 1L)))
    assert(r(4L) == ((2L, 3L, 2L)))  // 7 tokens from offset 19 → spills into bin 3
    assert(r(7L) == ((3L, 2L, 1L)))
  }

  test("scalable two-pass equals the window spec at 1/3/8 partitions") {
    val spec = Packing.packSequencesWindow(docs, capacity = 8).collect().toSeq
    Seq(1, 3, 8).foreach { n =>
      val got = Packing.packSequences(docs, capacity = 8, numPartitions = n)
        .collect().toSeq
      assert(got == spec, s"mismatch at numPartitions=$n")
    }
  }

  test("scalable form plans no Window operator") {
    val plan = Packing.packSequences(docs, capacity = 8, numPartitions = 4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "two-pass packing must not fall back to a global window")
  }

  test("a document larger than the capacity spans ceil(tokens/capacity)+boundary bins") {
    val big = df("doc_id BIGINT, text STRING", Seq(doc(0, 3), doc(1, 20), doc(2, 1)))
    val r = Packing.packSequences(big, capacity = 8, numPartitions = 2).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(r(1L) == ((0L, 3L, 3L))) // 20 tokens from offset 3 → bins 0,1,2
    assert(r(2L) == ((2L, 7L, 1L)))
  }

  test("manifest: starts per bin, spill accounting, covered bins absent") {
    val big = df("doc_id BIGINT, text STRING", Seq(doc(0, 3), doc(1, 30), doc(2, 1)))
    // doc 1 covers bins 1..3 fully; no doc STARTS there → bins 1-3 absent
    val m = Packing.binManifest(big, capacity = 8, numPartitions = 2).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(m.keySet == Set(0L, 4L))
    assert(m(0L) == ((2L, 33L, 0L, 5L))) // 2 starts, 3+30 tokens started, doc1 spans 5 bins
    assert(m(4L) == ((1L, 1L, 2L, 1L)))
  }

  test("empty input: zero rows, no failure") {
    val empty = df("doc_id BIGINT, text STRING", Seq.empty)
    assert(Packing.packSequences(empty, capacity = 8, numPartitions = 3).count() == 0L)
    assert(Packing.binManifest(empty, capacity = 8, numPartitions = 3).count() == 0L)
  }
}
