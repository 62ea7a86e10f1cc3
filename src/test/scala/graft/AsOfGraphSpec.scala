package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.{AsOfJoin, Graph, Pipelines, RangeJoin, TextAnalysis}

/** Edge-case pins for the round-2 operators: as-of join boundaries,
  * connected-components convergence, PII counting, repetition math, and
  * sequence-packing offsets.
  */
class AsOfGraphSpec extends SparkSpec {
  import spark.implicits._

  test("asof backward: inclusive boundary, carry-forward, and pre-history nulls") {
    val right = Seq(
      (1L, ts("2026-01-01 10:00:00"), 100L),
      (1L, ts("2026-01-01 12:00:00"), 200L),
      (2L, ts("2026-01-01 11:00:00"), 900L))
      .toDF("user_id", "ts", "ref")
    val left = Seq(
      (1L, 1L, ts("2026-01-01 09:00:00")), // before any right → null
      (1L, 2L, ts("2026-01-01 10:00:00")), // EQUAL ts → inclusive match
      (1L, 3L, ts("2026-01-01 11:59:59")), // carries the 10:00 row
      (1L, 4L, ts("2026-01-01 23:00:00")), // carries the 12:00 row
      (3L, 5L, ts("2026-01-01 10:00:00"))) // user with no right rows
      .toDF("user_id", "event_id", "ts")
    val got = AsOfJoin.backward(left, right, Seq("user_id"), "ts", Seq("ref"))
      .select("event_id", "ref").as[(Long, Option[Long])].collect().toMap
    assert(got == Map(1L -> None, 2L -> Some(100L), 3L -> Some(100L),
      4L -> Some(200L), 5L -> None))
  }

  test("connected components: chains merge transitively, singletons keep edges only") {
    val edges = Seq((2L, 1L), (2L, 3L), (3L, 4L), (4L, 5L), // chain 1..5
      (10L, 11L), (20L, 21L), (21L, 20L)) // dup/reversed edges collapse
      .toDF("id_a", "id_b")
    val got = Graph.connectedComponents(edges, "id_a", "id_b")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("connected components converge on a long chain within few rounds") {
    // a 301-node path has diameter 300: plain hash-min contraction
    // shortens it ~1-2 hops/round and would blow a 15-round cap; the
    // pointer-doubled mapping collapses 2^k hops/round, so this pins the
    // O(log diameter) convergence the scale path needs
    val n = 300
    val edges = (0 until n).map(i => (i.toLong, (i + 1).toLong))
      .toDF("id_a", "id_b")
    val comps = Graph.connectedComponents(edges, "id_a", "id_b", maxIters = 15)
      .as[(Long, Long)].collect()
    assert(comps.length == n + 1)
    assert(comps.forall(_._2 == 0L), "every node joins component 0")
  }

  test("LSH-fed dedup clusters equal brute-force clusters on a planted corpus") {
    // the 100 TB pair source (minhash-LSH banded buckets,
    // Pipelines.dedupClustersLsh) must resolve the SAME clusters as the
    // oracle-checkable brute pair source on a corpus with planted
    // near-dup chains: 12 chains of 4 variants (adjacent jaccard ~0.85)
    // + 20 unrelated singletons. Deterministic seed; LSH pairs are
    // exact-jaccard-verified so candidates ⊆ brute, and chain adjacency
    // carries the components even where a marginal bridge pair misses.
    val rnd = new scala.util.Random(7)
    val vocab = (1 to 400).map(i => s"w$i")
    def doc(): Seq[String] = Seq.fill(80)(vocab(rnd.nextInt(vocab.size)))
    val rows = scala.collection.mutable.ArrayBuffer[(Long, String)]()
    var id = 0L
    for (_ <- 1 to 12) {
      var cur = doc()
      for (_ <- 0 until 4) {
        rows += ((id, cur.mkString(" "))); id += 1
        cur = cur.map(w => // ~2 of 80 words mutate per chain step
          if (rnd.nextInt(40) == 0) vocab(rnd.nextInt(vocab.size)) else w)
      }
    }
    for (_ <- 1 to 20) { rows += ((id, doc().mkString(" "))); id += 1 }
    val docs = rows.toSeq.toDF("doc_id", "text")

    // brute truth: ALL-pairs word-shingle jaccard (the q53 oracle shape)
    val sh = docs.select($"doc_id".as("id"),
      array_distinct(
        graft.functions.TextFunctions.wordShingles($"text", 3)).as("s"))
    val brutePairs = sh.as("a").join(sh.as("b"), $"a.id" < $"b.id")
      .withColumn("j",
        graft.functions.TextFunctions.jaccard($"a.s", $"b.s"))
      .filter($"j" >= 0.5)
      .select($"a.id".as("id_a"), $"b.id".as("id_b"))
    def canon(cc: org.apache.spark.sql.DataFrame): Set[Set[Long]] = cc
      .as[(Long, Long)].collect().groupBy(_._2).values
      .map(_.map(_._1).toSet).toSet
    val brute = canon(Graph.connectedComponents(brutePairs, "id_a", "id_b"))
    val lsh = canon(
      Pipelines.dedupClustersLsh(docs, "doc_id", "text", threshold = 0.5))
    assert(brute.nonEmpty && brute.exists(_.size >= 4))
    assert(lsh == brute,
      s"LSH clusters ${lsh.size} must equal brute clusters ${brute.size}")
  }

  test("connected components equal a driver union-find on random dense graphs") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 3) {
      // dense planted cliques + random noise edges — the near-dup shape
      // the partition-local contraction pre-pass exists for
      val cliques = (0 until 10).flatMap { c =>
        val members = (0 until 5 + rnd.nextInt(20))
          .map(_ => (c * 1000 + rnd.nextInt(400)).toLong).distinct
        for (i <- members; j <- members if i < j) yield (i, j)
      }
      val noise = (0 until 300).map(_ =>
        (rnd.nextInt(10000).toLong, rnd.nextInt(10000).toLong))
        .filter { case (a, b) => a != b }
      val edges = (cliques ++ noise).toDF("id_a", "id_b")
        .repartition(7) // several partitions → real per-partition forests
      val got = Graph.connectedComponents(edges, "id_a", "id_b")
        .as[(Long, Long)].collect().toMap
      // driver reference union-find over the same edges
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        var r = x; while (parent.getOrElse(r, r) != r) r = parent(r); r
      }
      (cliques ++ noise).foreach { case (a, b) =>
        if (a != b) {
          parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
      }
      val want = parent.keys.map(k => k -> find(k)).toMap
      assert(got == want, s"trial $trial: components diverged")
    }
  }

  test("piiScrub counts emails and phones deterministically") {
    val docs = Seq(
      (1L, "reach me at a.b+c@mail.example.org or x@y.io thanks"),
      (2L, "call +1 (555) 123-4567 or 555 987 6543 today"),
      (3L, "no pii here at all")).toDF("doc_id", "text")
    val got = TextAnalysis.piiScrub(docs, "doc_id", "text")
      .select("doc_id", "n_emails", "n_phones")
      .as[(Long, Long, Long)].collect()
      .map { case (a, b, c) => a -> (b, c) }.toMap
    assert(got(1L) == (2L, 0L))
    assert(got(2L)._2 >= 1L && got(2L)._1 == 0L)
    assert(got(3L) == (0L, 0L))
  }

  test("pageRank: hand-computed trajectories — cycle fixed point, " +
      "star concentration, dangling leak, duplicate-edge collapse") {
    def ranks(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
      Graph.pageRank(edges.toDF("s", "t"), "s", "t", iters)
        .as[(Long, Long)].collect().toMap
    // 3-cycle: every node keeps exactly 1e6 — the uniform fixed point
    assert(ranks(Seq((0L, 1L), (1L, 2L), (2L, 0L)), 4) ==
      Map(0L -> 1000000L, 1L -> 1000000L, 2L -> 1000000L))
    // star 1,2,3 → 0 and 0 → 1, two iterations by hand
    assert(ranks(Seq((1L, 0L), (2L, 0L), (3L, 0L), (0L, 1L)), 2) ==
      Map(0L -> 1255000L, 1L -> 2445000L, 2L -> 150000L, 3L -> 150000L))
    // dangling node B drops its mass; duplicate edge counts once
    assert(ranks(Seq((1L, 2L), (1L, 2L)), 2) ==
      Map(1L -> 150000L, 2L -> 277500L))
  }

  test("bm25Score: hand-computed integer scores, absent terms vanish") {
    val docs = Seq((1L, "a b a"), (2L, "a c"), (3L, "b b b"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.bm25Score(docs, "doc_id", "text",
        Seq("a", "b", "missing"))
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    // N=3, T=8; df(a)=df(b)=2 → idf_e3 = 4000//3 = 1333
    // doc1 dl=3: tf(a)=2 → 352000//265=1328; tf(b)=1 → 176000//185=951
    assert(got(1L) == (3L, 2L, 1333L * (1328L + 951L)))
    // doc2 dl=2: tf(a)=1 → 176000//158=1113
    assert(got(2L) == (2L, 1L, 1333L * 1113L))
    // doc3 dl=3: tf(b)=3 → 528000//345=1530
    assert(got(3L) == (3L, 1L, 1333L * 1530L))
  }

  test("lineFilter: C4 line rules hand-computed incl. every edge") {
    val docs = Seq(
      // two good lines + one unterminated + one short + one bad phrase
      (1L, "alpha beta gamma.\nshort no.\nno terminal punct here\n" +
        "uses JavaScript heavily.\nend of doc. words here!"),
      (2L, "lorem ipsum dolor sit.\nanother fine line here."), // doc kill
      (3L, "one terminal line only here."),                     // < minKept
      (4L, "ends with quote \"\nbang line is fine!\nand a question?"),
      (5L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val got = TextAnalysis.lineFilter(docs, "doc_id", "text",
        minLineWords = 3, minKeptLines = 2)
      .as[(Long, Long, Long, String, Boolean, Boolean)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4, r._5, r._6)).toMap
    // doc 1: 5 lines; "short no." fails word count, "no terminal..."
    // fails punctuation, the javascript line fails the phrase rule
    assert(got(1L) == (5L, 2L,
      "alpha beta gamma.\nend of doc. words here!", false, true))
    // doc 2: both lines keep, but "lorem ipsum" kills the document
    assert(got(2L) == (2L, 2L,
      "lorem ipsum dolor sit.\nanother fine line here.", true, false))
    // doc 3: one surviving line < minKeptLines
    assert(got(3L) == (1L, 1L, "one terminal line only here.", false, false))
    // doc 4: quote counts as terminal; the quote line has 3+ words
    assert(got(4L) == (3L, 3L,
      "ends with quote \"\nbang line is fine!\nand a question?",
      false, true))
    // null text: zero lines, empty rebuild, fails
    assert(got(5L) == (0L, 0L, "", false, false))
  }

  test("repetitionMetrics: hand-computed duplicate and top-token shares") {
    val docs = Seq((1L, "a a a b"), (2L, "x y z"), (3L, "")).toDF("doc_id", "text")
    val got = TextAnalysis.repetitionMetrics(docs, "doc_id", "text")
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap
    // "a a a b": 4 tokens, 2 distinct → dup = 0.5, top share = 0.75
    assert(got(1L) == (4L, 2L, 500000L, 750000L))
    assert(got(2L) == (3L, 3L, 0L, 333333L))
    assert(!got.contains(3L), "empty docs have no defined ratios")
  }

  test("ngramRepetitionMetrics: hand-computed bigram shares") {
    val docs = Seq(
      (1L, "a b a b a"),   // bigrams: ab, ba, ab, ba → 4 occ, top 2, dup 4/4
      (2L, "x y z"),       // xy, yz → 2 occ, top 1, dup 0
      (3L, "solo"),        // < 2 words: omitted
      (4L, "")).toDF("doc_id", "text")
    val got = TextAnalysis.ngramRepetitionMetrics(docs, "doc_id", "text", n = 2)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap
    assert(got(1L) == (4L, 2L, 500000L, 1000000L))
    assert(got(2L) == (2L, 1L, 500000L, 0L))
    assert(!got.contains(3L) && !got.contains(4L),
      "docs with fewer than n words have no defined gram")
    // trigrams over doc 1: "a b a", "b a b", "a b a" → top 2 of 3
    val tri = TextAnalysis.ngramRepetitionMetrics(docs, "doc_id", "text", n = 3)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap
    assert(tri(1L) == (3L, 2L, 666667L, 666667L))
    assert(tri(2L) == (1L, 1L, 1000000L, 0L))
  }

  test("lmScore: hand-computed stupid-backoff micro-unit scores") {
    // train = doc 0 only: tokens [a,b,a,c] → uni a=2,b=1,c=1, N=4;
    // bigrams (a,b)(b,a)(a,c) each once; ctx a=2, b=1
    val docs = Seq((0L, "a b a c"), (1L, "a b x"), (2L, ""), (3L, "z z"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.lmScore(docs,
        docs.filter($"doc_id" === 0), "doc_id", "text")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    // doc 0: first a = 2/4; (a,b)=1/2; (b,a)=1/1; (a,c)=1/2
    assert(got(0L) == (4L, 2500000L, 625000L))
    // doc 1: first a = 2/4; (a,b)=1/2; (b,x) unseen, c(x)=0 → 0
    assert(got(1L) == (3L, 1000000L, 333333L))
    // doc 3: all OOV → every position 0 (floor(0.5) = 0)
    assert(got(3L) == (2L, 0L, 0L))
    // empty text: nothing to score
    assert(!got.contains(2L))
    // unseen-bigram backoff really reaches the unigram: train with a
    // doc whose bigram (b,c) is absent but c is in-vocabulary
    val got2 = TextAnalysis.lmScore(
        Seq((9L, "b c")).toDF("doc_id", "text"),
        docs.filter($"doc_id" === 0), "doc_id", "text")
      .as[(Long, Long, Long, Long)].collect().head
    // first b = 1/4 → 250000; (b,c) unseen → 0.4 * (1/4) = 0.1 → 100000
    assert(got2 == ((9L, 2L, 350000L, 175000L)))
  }

  test("ccnetBuckets: integer-rank thirds per group, deterministic ties") {
    val scored = Seq(
      (1L, "en", 900L), (2L, "en", 800L), (3L, "en", 700L),
      (4L, "en", 600L), (5L, "en", 500L), (6L, "en", 400L),
      (7L, "de", 100L), (8L, "de", 100L)) // score tie → id breaks it
      .toDF("doc_id", "lang", "lm_avg_e6")
    val got = TextAnalysis.ccnetBuckets(scored, "doc_id", "lm_avg_e6", "lang")
      .select("doc_id", "bucket").as[(Long, String)].collect().toMap
    assert(got(1L) == "head" && got(2L) == "head")
    assert(got(3L) == "middle" && got(4L) == "middle")
    assert(got(5L) == "tail" && got(6L) == "tail")
    // n=2: rank 1 → 3 ≤ 4 = middle; rank 2 (the larger id) → tail
    assert(got(7L) == "middle" && got(8L) == "tail")
  }

  test("sharedWindowStats: cross-doc window sharing, hand-computed") {
    // n = 3 windows; docs 1 and 2 share "b c d" (and only it);
    // doc 3 is clean; doc 4 too short
    val docs = Seq(
      (1L, "a b c d"),      // windows: abc, bcd
      (2L, "b c d e f"),    // windows: bcd, cde, def
      (3L, "p q r s"),      // windows: pqr, qrs — unshared
      (4L, "x y")).toDF("doc_id", "text")
    val got = TextAnalysis.sharedWindowStats(docs, "doc_id", "text", n = 3)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(got(1L) == (2L, 1L, 500000L))
    assert(got(2L) == (3L, 1L, 333333L))
    assert(got(3L) == (2L, 0L, 0L))
    assert(!got.contains(4L), "docs shorter than the window are omitted")
    // intra-doc repetition does NOT count as shared: a doc repeating its
    // own window sees occurrences > 1 but n_docs = 1
    val solo = Seq((9L, "m n o m n o")).toDF("doc_id", "text")
    val g9 = TextAnalysis.sharedWindowStats(solo, "doc_id", "text", n = 3)
      .as[(Long, Long, Long, Long)].collect().head
    assert(g9 == ((9L, 4L, 0L, 0L)))
  }

  test("packSequences: shard-local cumulative offsets and pack indices") {
    // token counts: id 0 → 2 tokens, id 2 → 3, id 4 → 2 (shard 0);
    //               id 1 → 4 tokens, id 3 → 1 (shard 1); budget 4
    val docs = Seq(
      (0L, "w w"), (1L, "w w w w"), (2L, "w w w"), (3L, "w"), (4L, "w w"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.packSequences(docs, "doc_id", "text",
        tokenBudget = 4, nShards = 2)
      .select("doc_id", "shard", "pack_idx", "pack_offset")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(got(0L) == (0L, 0L, 0L)) // starts pack 0 offset 0
    assert(got(2L) == (0L, 0L, 2L)) // starts in pack 0 at offset 2
    assert(got(4L) == (0L, 1L, 1L)) // cumulative 5 → pack 1 offset 1
    assert(got(1L) == (1L, 0L, 0L))
    assert(got(3L) == (1L, 1L, 0L)) // starts exactly at the budget edge
  }

  test("asof backward equals an independent in-memory reference on random data") {
    val rnd = new scala.util.Random(11)
    // random timestamps with deliberate collisions (coarse grid) so the
    // equal-ts inclusive path is exercised repeatedly
    def randTs() = new Timestamp(1700000000000L + rnd.nextInt(500) * 60000L)
    val rightRows = (1 to 300).map(i =>
      (rnd.nextInt(8).toLong, randTs(), i.toLong))
      // unique per (key, ts): keep the max ref like the operator requires
      .groupBy(r => (r._1, r._2)).values.map(_.maxBy(_._3)).toSeq
    val leftRows = (1 to 500).map(i => (rnd.nextInt(10).toLong, i.toLong, randTs()))
    val right = rightRows.toDF("user_id", "ts", "ref")
    val left = leftRows.toDF("user_id", "event_id", "ts")
    val got = AsOfJoin.backward(left, right, Seq("user_id"), "ts", Seq("ref"))
      .select("event_id", "ref").as[(Long, Option[Long])].collect().toMap
    // reference: per left row, latest right at-or-before, scala-side
    val byKey = rightRows.groupBy(_._1)
    val expected = leftRows.map { case (k, id, t) =>
      val cand = byKey.getOrElse(k, Nil).filter(!_._2.after(t))
      id -> (if (cand.isEmpty) None
             else Some(cand.maxBy(r => (r._2.getTime, r._3))._3))
    }.toMap
    assert(got == expected)
  }

  test("range join: inclusive bounds, bucket-straddling intervals, no duplicates") {
    val points = Seq(
      (1L, ts("2026-01-01 10:00:00")), // exactly at a window start
      (2L, ts("2026-01-01 10:29:59")),
      (3L, ts("2026-01-01 10:30:00")), // exactly at a window end
      (4L, ts("2026-01-01 10:30:01")), // just outside
      (5L, ts("2026-01-01 11:45:00"))) // inside the bucket-straddling window
      .toDF("event_id", "ts")
    val windows = Seq(
      (100L, ts("2026-01-01 10:00:00"), ts("2026-01-01 10:30:00")),
      // straddles a 30-min bucket boundary (starts mid-bucket)
      (200L, ts("2026-01-01 11:40:00"), ts("2026-01-01 12:10:00")))
      .toDF("window_id", "win_start", "win_end")
    val got = RangeJoin.pointInInterval(points, windows,
        "ts", "win_start", "win_end", bucketSeconds = 1800)
      .select("window_id", "event_id").as[(Long, Long)].collect().sorted.toSeq
    assert(got == Seq((100L, 1L), (100L, 2L), (100L, 3L), (200L, 5L)))
  }

  private def ts(s: String) = Timestamp.valueOf(s)
}
