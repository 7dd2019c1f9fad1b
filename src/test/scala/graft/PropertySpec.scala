package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.{AsofJoin, Dedup, Sampling}

/** Property-based checks: randomized inputs (scalacheck generators with
  * FIXED seeds — reproducible failures) against independently-computed
  * naive semantics. These pin behaviors the example-based specs cannot
  * sweep: equal-timestamp ties, empty sides, duplicate keys. */
class PropertySpec extends SparkSpec {

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  /** Random event sets with DELIBERATELY colliding timestamps (small ts
    * domain) — the regime where as-of tie semantics matter. */
  private val eventsGen: Gen[List[(String, Long, Int)]] =
    Gen.listOfN(60, for {
      key <- Gen.oneOf("k1", "k2", "k3")
      ts <- Gen.choose(0L, 19L)
      isLeft <- Gen.oneOf(0, 1)
    } yield (key, ts, isLeft))

  test("asof join equals the naive per-row max(right.ts <= left.ts), ties included") {
    for (seed <- 1L to 8L) {
      val evs = sample(eventsGen, seed).zipWithIndex
      val left = df("client STRING, ts TIMESTAMP, id BIGINT",
        evs.collect { case ((k, t, 1), i) =>
          Row(k, new java.sql.Timestamp(t * 1000), i.toLong) })
      val right = df("client STRING, ts TIMESTAMP, allowed_ts TIMESTAMP",
        evs.collect { case ((k, t, 0), _) =>
          Row(k, new java.sql.Timestamp(t * 1000), new java.sql.Timestamp(t * 1000)) })
      val got = AsofJoin.asof(left, right, "client", "ts", Seq("allowed_ts"))
        .select("client", "id", "asof_allowed_ts").collect()
        .map(r => (r.getString(0), r.getLong(1)) -> Option(r.getTimestamp(2))).toMap
      // naive oracle: for each left row, the max right ts <= its ts
      val rightTs = evs.collect { case ((k, t, 0), _) => (k, t) }
      val want = evs.collect { case ((k, t, 1), i) =>
        (k, i.toLong) -> rightTs.filter(r => r._1 == k && r._2 <= t)
          .map(_._2).maxOption.map(m => new java.sql.Timestamp(m * 1000))
      }.toMap
      assert(got == want, s"seed=$seed")
    }
  }

  test("NATIVE asof (custom exec) equals the naive model on colliding-ts random inputs") {
    for (seed <- 11L to 18L) {
      val evs = sample(eventsGen, seed).zipWithIndex
      val left = df("client STRING, ts TIMESTAMP, id BIGINT",
        evs.collect { case ((k, t, 1), i) =>
          Row(k, new java.sql.Timestamp(t * 1000), i.toLong) })
      val right = df("client STRING, ts TIMESTAMP, allowed_ts TIMESTAMP",
        evs.collect { case ((k, t, 0), _) =>
          Row(k, new java.sql.Timestamp(t * 1000), new java.sql.Timestamp(t * 1000)) })
      val got = graft.plans.NativeAsof.asof(left, right, "client", "ts", Seq("allowed_ts"))
        .select("client", "id", "asof_allowed_ts").collect()
        .map(r => (r.getString(0), r.getLong(1)) -> Option(r.getTimestamp(2))).toMap
      val rightTs = evs.collect { case ((k, t, 0), _) => (k, t) }
      val want = evs.collect { case ((k, t, 1), i) =>
        (k, i.toLong) -> rightTs.filter(r => r._1 == k && r._2 <= t)
          .map(_._2).maxOption.map(m => new java.sql.Timestamp(m * 1000))
      }.toMap
      assert(got == want, s"seed=$seed")
      // elimination invariant: payload-blind count == |left| exactly
      // (one output row per left row; AsOfJoinElimination makes the
      // count a plain left-side count, so this also guards the rule)
      val cnt = graft.plans.NativeAsof.asof(left, right, "client", "ts", Seq("allowed_ts")).count()
      assert(cnt == left.count(), s"seed=$seed: asof count != left count")
    }
  }

  test("forward asof equals the naive per-row min(right.ts >= left.ts), ties included") {
    for (seed <- 1L to 8L) {
      val evs = sample(eventsGen, seed).zipWithIndex
      val left = df("client STRING, ts TIMESTAMP, id BIGINT",
        evs.collect { case ((k, t, 1), i) =>
          Row(k, new java.sql.Timestamp(t * 1000), i.toLong) })
      val right = df("client STRING, ts TIMESTAMP, blocked_ts TIMESTAMP",
        evs.collect { case ((k, t, 0), _) =>
          Row(k, new java.sql.Timestamp(t * 1000), new java.sql.Timestamp(t * 1000)) })
      val got = AsofJoin.asofForward(left, right, "client", "ts", Seq("blocked_ts"))
        .select("client", "id", "asof_blocked_ts").collect()
        .map(r => (r.getString(0), r.getLong(1)) -> Option(r.getTimestamp(2))).toMap
      // naive oracle: for each left row, the min right ts >= its ts
      val rightTs = evs.collect { case ((k, t, 0), _) => (k, t) }
      val want = evs.collect { case ((k, t, 1), i) =>
        (k, i.toLong) -> rightTs.filter(r => r._1 == k && r._2 >= t)
          .map(_._2).minOption.map(m => new java.sql.Timestamp(m * 1000))
      }.toMap
      assert(got == want, s"seed=$seed")
    }
  }

  test("exact-dedup summary satisfies its counting identities on random corpora") {
    val corpusGen = Gen.listOfN(40, Gen.oneOf("a", "b", "c", "d", "e", "f words here"))
    for (seed <- 1L to 5L) {
      val texts = sample(corpusGen, seed)
      val docs = df("doc_id BIGINT, text STRING",
        texts.zipWithIndex.map { case (t, i) => Row(i.toLong, t) })
      val s = Dedup.exactSummary(docs).head
      assert(s.getAs[Long]("total_docs") == texts.length)
      assert(s.getAs[Long]("distinct_texts") == texts.distinct.length)
      assert(s.getAs[Long]("removed") == texts.length - texts.distinct.length)
      // groups partition the corpus: sizes sum to total
      val groups = Dedup.exactGroups(docs).collect()
      assert(groups.map(_.getAs[Long]("n_copies")).sum == texts.length)
      assert(groups.length == texts.distinct.length)
    }
  }

  test("hash-sample membership is monotone in the bucket count (any pair)") {
    val docs = df("doc_id BIGINT, lang STRING, n_chars BIGINT",
      (0 until 300).map(i => Row(i.toLong, "en", 10L)))
    val bucketPair = for {
      lo <- Gen.choose(1, 128); hi <- Gen.choose(129, 256)
    } yield (lo, hi)
    for (seed <- 1L to 6L) {
      val (lo, hi) = sample(bucketPair, seed)
      val small = Sampling.hashSample(docs, lo).select("doc_id")
        .collect().map(_.getLong(0)).toSet
      val big = Sampling.hashSample(docs, hi).select("doc_id")
        .collect().map(_.getLong(0)).toSet
      assert(small.subsetOf(big), s"buckets $lo ⊄ $hi")
    }
  }

  test("interpolation preserves observed points and stays within neighbor bounds") {
    for (seed <- Seq(5, 23)) {
      val prep = FtlFixture.prep(spark, seed, 600)
      val interp = graft.operators.PlotData.interpolatedHourly(prep)
        .collect().map(r => r.getTimestamp(0) -> r.getDouble(1)).toMap
      val observed = prep.filter(col("status_type") === "Blocked")
        .groupBy(date_trunc("HOUR", col("ts")).as("h")).count()
        .collect().map(r => r.getTimestamp(0) -> r.getLong(1).toDouble).toMap
      // observed buckets pass through exactly
      observed.foreach { case (h, c) => assert(interp(h) == c, s"seed=$seed $h") }
      // every value lies within the global observed range (lerp between
      // neighbors can never extrapolate)
      val (lo, hi) = (observed.values.min, observed.values.max)
      assert(interp.values.forall(v => v >= lo - 1e-9 && v <= hi + 1e-9), s"seed=$seed")
    }
  }

  test("json props rollup tolerates malformed/missing JSON as a NULL bucket") {
    val raw = df("props STRING, value DOUBLE", Seq(
      Row("""{"k": 12}""", 1.0), Row("""{"k": 17}""", 2.0),
      Row("""not json at all""", 4.0), Row("""{"other": 5}""", 8.0),
      Row(null, 16.0)))
    val out = Preprocess.jsonPropsRollup(raw).collect()
      .map(r => (if (r.isNullAt(0)) None else Some(r.getInt(0))) -> r.getAs[Long]("n")).toMap
    assert(out == Map(Some(10) -> 2L, None -> 3L), out.toString)
  }

  test("p10 typed JSON parse: a quoted number nulls the struct (strict from_json, pinned)") {
    // the DuckDB oracle's TRY_CAST(json_extract_string(..)) would parse
    // '"5"' to 5 — the engines intentionally diverge on dirty data, and
    // the generated props are all clean integer JSON; this pins OUR
    // intended semantics so the divergence stays a documented choice
    val raw = df("event_type STRING, props STRING, value DOUBLE", Seq(
      Row("A", """{"k": 5}""", 1.0),
      Row("A", """{"k": "5"}""", 1.0), // quoted number: whole struct nulls
      Row("A", """not json""", 1.0)))
    val r = Preprocess.jsonPropsTyped(raw).head
    assert(r.getAs[Long]("n") == 3 && r.getAs[Long]("n_parsed") == 1)
    assert(r.getAs[Int]("min_k") == 5 && r.getAs[Int]("max_k") == 5)
  }

  test("sessionization partitions each client's events; inter-session gaps exceed the threshold") {
    for (seed <- Seq(3, 17)) {
      val prep = FtlFixture.prep(spark, seed, 800)
      val sessions = graft.operators.Streaks.sessionize(prep, 1800).collect()
      val perClient = prep.groupBy("client").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      // every event is in exactly one session
      val sums = sessions.groupBy(_.getString(0))
        .view.mapValues(_.map(_.getAs[Long]("n_events")).sum).toMap
      assert(sums == perClient, s"seed=$seed")
      // consecutive sessions of one client are > gap apart
      sessions.groupBy(_.getString(0)).foreach { case (_, ss) =>
        val ordered = ss.sortBy(_.getAs[java.sql.Timestamp]("session_start").getTime)
        ordered.sliding(2).foreach {
          case Array(a, b) =>
            val gap = b.getAs[java.sql.Timestamp]("session_start").getTime -
              a.getAs[java.sql.Timestamp]("session_end").getTime
            assert(gap > 1800 * 1000L, s"seed=$seed gap=$gap")
          case _ =>
        }
      }
    }
  }

  /** Random corpora of random-length docs over a tiny vocabulary (heavy
    * shingle collisions — the decontamination/chunking stress regime). */
  private val docsGen: Gen[List[(Long, String)]] =
    Gen.listOfN(25, Gen.choose(0, 40)).map(_.zipWithIndex.map { case (n, i) =>
      (i.toLong, (0 until n).map(k => s"w${(i * 7 + k * 3) % 11}").mkString(" "))
    })

  test("chunking: every window/stride covers all tokens, strides exactly, never overshoots") {
    for (seed <- 1L to 6L) {
      val ds = sample(docsGen, seed)
      val docs = df("doc_id BIGINT, text STRING, lang STRING",
        ds.map { case (i, t) => Row(i, t, "en") })
      for ((w, s) <- Seq((4, 3), (5, 5), (8, 2))) {
        val chunks = graft.operators.Packing.chunkDocs(docs, w, s).collect()
          .groupBy(_.getLong(0)).view.mapValues(_.sortBy(_.getInt(2))).toMap
        ds.foreach { case (id, text) =>
          val n = text.split(" ", -1).length // split("") = [""] — never 0
          val cs = chunks(id)
          // chunk k holds tokens [k*s+1, min(k*s+w, n)]; the LAST chunk
          // reaches the end; no chunk is empty; all but the last are full
          assert(cs.head.getInt(2) == 0 && cs.last.getInt(2) * s + cs.last.getInt(3) == n,
            s"seed=$seed doc=$id w=$w s=$s: tail coverage broken")
          cs.zipWithIndex.foreach { case (c, k) =>
            assert(c.getInt(2) == k, "chunk_no must be dense from 0")
            val expectLen = math.min(w, n - k * s)
            assert(c.getInt(3) == expectLen && expectLen > 0,
              s"seed=$seed doc=$id chunk=$k: len ${c.getInt(3)} != $expectLen")
          }
        }
      }
    }
  }

  test("decontamination equals the naive set-overlap oracle") {
    for (seed <- 10L to 14L) {
      val ds = sample(docsGen, seed)
      val (evalD, corpusD) = ds.partition(_._1 % 5 == 0)
      val docs = df("doc_id BIGINT, text STRING, source STRING",
        ds.map { case (i, t) => Row(i, t, if (i % 5 == 0) "ev" else "c") })
      val got = Dedup.decontaminate(docs, "ev", minOverlap = 2).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      def tris(t: String): Set[String] = {
        val ws = t.split(" ", -1)
        if (ws.length < 3) Set.empty
        else ws.sliding(3).map(_.mkString(" ")).toSet
      }
      val evalSet = evalD.flatMap(d => tris(d._2)).toSet
      val want = corpusD.map { case (i, t) =>
        val sh = tris(t); i -> ((sh.size.toLong, sh.count(evalSet).toLong))
      }.filter(_._2._2 >= 2).toMap
      assert(got == want, s"seed=$seed")
    }
  }

  /** Random key sequences with few distinct values and colliding run
    * lengths — the regime where the round-9 boundary-stitching streak
    * machinery (interior-only pass 2, driver-stitched spanning runs,
    * pass-1 argmax) must agree with the naive RLE at every partition
    * width, including partitions that hold a single run or are empty. */
  private val keySeqGen: Gen[List[String]] =
    Gen.choose(1, 80).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("Allowed", "Blocked", "Other")))

  test("stitched parallel runs equal the naive RLE at random partition widths") {
    import graft.operators.Streaks
    for (seed <- 1L to 10L) {
      val keys = sample(keySeqGen, seed)
      val prep = df("ts TIMESTAMP, id BIGINT, status_type STRING",
        keys.zipWithIndex.map { case (k, i) =>
          Row(new java.sql.Timestamp(i * 1000L), i.toLong, k) })
      // naive RLE over the ordered keys: (grp from 1, key, len, startIdx)
      val naive = keys.zipWithIndex.foldLeft(List.empty[(Long, String, Long, Int)]) {
        case (acc, (k, i)) => acc match {
          case (g, `k`, len, s) :: t => (g, k, len + 1, s) :: t
          case (g, _, _, _) :: _    => (g + 1, k, 1L, i) :: acc
          case Nil                   => List((1L, k, 1L, i))
        }
      }.reverse
      for (parts <- Seq(1, 2, 3, 7, 32)) {
        val got = Streaks.parallelRunsBy(prep, col("status_type"),
            org.apache.spark.sql.types.StringType, parts)
          .collect()
          .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
            r.getTimestamp(3).getTime / 1000L)).toSet
        val want = naive.map { case (g, k, l, s) => (g, k, l, s.toLong) }.toSet
        assert(got == want, s"seed=$seed parts=$parts")
        // the single-pass argmax agrees with the naive per-class best
        // (len desc, start asc)
        val streaks = Streaks.longestStreaks(prep).collect()
          .map(r => r.getString(0) -> ((r.getLong(1), r.getTimestamp(2).getTime / 1000L))).toMap
        for (cls <- Seq("Allowed", "Blocked")) {
          val cand = naive.filter(_._2 == cls)
          if (cand.isEmpty) assert(!streaks.contains(cls), s"seed=$seed")
          else {
            val best = cand.map { case (_, _, l, s) => (l, s.toLong) }
              .minBy { case (l, s) => (-l, s) }
            assert(streaks(cls) == best, s"seed=$seed cls=$cls")
          }
        }
      }
    }
  }

  test("capSeries conserves volume and honors the point bound at random spans") {
    // random span (hours..decades) and cap — at every draw the in-plan
    // rollup must (a) keep <= maxPoints+1 buckets per series, (b) sum
    // counts exactly (a lossy downsample would quietly corrupt charts),
    // (c) pass hour buckets through untouched below the threshold
    val caseGen = for {
      hours <- Gen.choose(10, 200000)
      step <- Gen.choose(1, 48)
      cap <- Gen.oneOf(24, 100, 2048)
    } yield (hours, step, cap)
    for (seed <- 1L to 6L) {
      val (hours, step, cap) = sample(caseGen, seed)
      val n = math.max(2, hours / step)
      val hourly = spark.range(n).select(
        timestamp_seconds(lit(1400000000L) + col("id") * (step * 3600L)).as("ts_hour"),
        lit("Allowed").as("status_type"),
        (col("id") % 7 + 1).as("cnt"))
      val capped = graft.operators.PlotData
        .capSeries(hourly, "ts_hour", Seq("status_type"), maxPoints = cap)
        .collect()
      assert(capped.length <= cap + 1,
        s"seed=$seed hours=$hours step=$step cap=$cap got ${capped.length}")
      val expect = hourly.agg(sum("cnt")).head.getLong(0)
      assert(capped.map(_.getLong(2)).sum == expect, s"seed=$seed volume must conserve")
      if ((n - 1).toLong * step <= cap) {
        // span under the hour threshold: input passes through untouched
        assert(capped.length == n, s"seed=$seed pass-through must keep all buckets")
      }
    }
  }
}
