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

  // ---- per-document chunking (p14/p15) ----

  private def langDoc(id: Long, nTokens: Int): Row =
    Row(id, (1 to math.max(nTokens, 1)).map(i => s"t$i").mkString(" "), "en")

  private val chunkDocs = df("doc_id BIGINT, text STRING, lang STRING",
    Seq(langDoc(0, 10), langDoc(1, 5), langDoc(2, 1), langDoc(3, 4), langDoc(4, 8)))

  test("chunking: full coverage, fixed stride, truncated tail") {
    // window=4, stride=3: 10 tokens → starts 1,4,7 (lens 4,4,4);
    // 5 → starts 1,4 (lens 4,2); 1 → one chunk len 1; 4 → one chunk len 4;
    // 8 → starts 1,4 (lens 4,4) — (8-4+2) div 3 = 2 yields start 7 len 2?
    // no: (8-4+3-1) div 3 = 6 div 3 = 2 → starts 1,4,7, lens 4,4,2
    val out = Packing.chunkDocs(chunkDocs, window = 4, stride = 3).collect()
      .groupBy(_.getLong(0)).map { case (id, rs) =>
        id -> rs.sortBy(_.getInt(2)).map(_.getInt(3)).toSeq }
    assert(out(0L) == Seq(4, 4, 4))
    assert(out(1L) == Seq(4, 2))
    assert(out(2L) == Seq(1))
    assert(out(3L) == Seq(4))
    assert(out(4L) == Seq(4, 4, 2))
    // every token index is covered: sum of (n_tokens - overlap) == doc tokens
    // here directly: last chunk always reaches the end (start + len == n + 1)
    val ends = Packing.chunkDocs(chunkDocs, window = 4, stride = 3).collect()
      .groupBy(_.getLong(0)).map { case (id, rs) =>
        val last = rs.maxBy(_.getInt(2))
        id -> (last.getInt(2) * 3 + last.getInt(3)) }
    assert(ends == Map(0L -> 10, 1L -> 5, 2L -> 1, 3L -> 4, 4L -> 8))
  }

  test("chunk hashes are the md5 of the exact token span") {
    val h = Packing.chunkDocs(chunkDocs, window = 4, stride = 3)
      .filter("doc_id = 0 AND chunk_no = 1").head.getString(4)
    val expected = spark.sql("SELECT md5('t4 t5 t6 t7')").head.getString(0)
    assert(h == expected)
  }

  test("window must cover the stride (no token may fall between chunks)") {
    intercept[IllegalArgumentException] {
      Packing.chunkDocs(chunkDocs, window = 2, stride = 3)
    }
  }

  test("chunkStats: chunk-level dedup signal and no join/window in the plan") {
    // two identical docs → their chunks collide in chunk_hash
    val dup = df("doc_id BIGINT, text STRING, lang STRING",
      Seq(langDoc(0, 10), Row(1L, (1 to 10).map(i => s"t$i").mkString(" "), "en")))
    val r = Packing.chunkStats(dup, window = 4, stride = 3).head
    assert(r.getString(0) == "en" && r.getLong(1) == 6 && r.getLong(2) == 3)
    assert(r.getInt(4) == 2)
    val plan = Packing.chunkStats(dup, window = 4, stride = 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join") && !plan.contains("Window"),
      "chunk stats must stay a scan-ride projection + aggregate")
  }
}
