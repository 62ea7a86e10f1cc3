package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._
import graft.functions.VectorFunctions._
import graft.operators.TextAnalysis.fingerprint

/** Deduplication operators for a large-scale training-data pipeline
  * (SURVEY.md §7.6): exact, MinHash+LSH, SimHash, n-gram Jaccard,
  * embedding-cosine near-dup.
  *
  * Scale design notes (100 TB):
  *  - exact dedup is one hash-aggregate on the fingerprint — a single
  *    shuffle keyed by a 128-bit digest, no skew (digests are uniform);
  *  - MinHash/LSH shuffles only (band-key, doc-id) pairs (k·b longs per
  *    doc, not the text), then joins candidates back for verification —
  *    the classic shingle→minhash→band→bucket-join pipeline;
  *  - degenerate LSH buckets (boilerplate-heavy corpora) are capped to
  *    avoid the quadratic bucket explosion — the cap is observable, not
  *    silent (bucket sizes are available via `bucketStats`);
  *  - all candidate verification is done pairwise AFTER the candidate
  *    join, so the expensive exact-Jaccard runs on candidates only.
  */
object Dedup {

  /** Spread a (possibly few-input-split) relation across the cluster's
    * parallelism before a CPU-bound per-row stage. A compact parquet
    * source arrives as one split; shingling 100 TB or 100 MB on one task
    * is the same mistake. (Shared with TextAnalysis' regex-heavy ops.)
    *
    * NEAR-SOURCE USE ONLY: `df.rdd.getNumPartitions` forces physical
    * planning of the upstream plan outside AQE — harmless on a leaf scan
    * (its only intended position), but on a derived plan it would both
    * plan twice and bypass AQE's runtime coalescing.
    */
  private[operators] def spread(df: DataFrame): DataFrame = {
    val parts = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < parts) df.repartition(parts) else df
  }

  /** Corpus side tables above this row count must never be broadcast
    * (see [[noBroadcastWhenLarge]]). ~100k array rows ≈ 50-150 MB
    * deserialized — below it a broadcast is safe and fast, above it the
    * relation build is the failure mode.
    */
  private val BroadcastSafeRows = 100000L

  /** Guard a CACHED corpus-derived side table against adaptive broadcast.
    * These tables carry long/float arrays whose shuffle bytes COMPRESS
    * 10-20× below their in-memory size (minhash minima share structure;
    * embedding floats share exponents), so AQE's compressed-size estimate
    * can flip the join to broadcast and then blow up building the
    * deserialized relation. The row count is exact and cheap — the caller
    * just materialized the cache — so the hint is applied only when the
    * relation is genuinely too big, keeping small-corpus broadcasts.
    */
  private def noBroadcastWhenLarge(df: DataFrame, cachedRows: Long): DataFrame =
    if (cachedRows > BroadcastSafeRows) df.hint("shuffle_hash") else df

  /** Exact dedup: keep the lowest-id document per normalized-text
    * fingerprint (deterministic representative).
    */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.withColumn("fp", fingerprint(col(textCol)))
      .groupBy(col("fp"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_dups"))

  /** MinHash + LSH near-duplicate candidate pairs, verified by exact
    * Jaccard on distinct word shingles.
    *
    * @param shingleN       word n-gram size
    * @param k              MinHash signature length
    * @param bands          LSH bands (k = bands * rowsPerBand)
    * @param threshold      exact-Jaccard verification threshold
    * @param maxBucketSize  drop degenerate LSH buckets larger than this
    */
  def minhashNearDups(docs: DataFrame, idCol: String, textCol: String,
                      shingleN: Int = 3, k: Int = 64, bands: Int = 16,
                      threshold: Double = 0.6,
                      maxBucketSize: Int = 200): DataFrame = {
    // an inexact split silently weakens the operator: bands > k makes
    // every band key constant (whole corpus in one bucket → the cap
    // drops everything → ZERO pairs reported for a dirty corpus); a
    // non-dividing bands leaves signature slots unused (recall silently
    // below what k promises)
    require(bands > 0 && bands <= k && k % bands == 0,
      s"bands ($bands) must divide the signature length k ($k)")
    val rowsPerBand = k / bands
    // shingle ONCE, as 64-bit hashes: signatures derive from the hashed
    // set, and candidate verification compares long arrays (an order of
    // magnitude cheaper than string-array intersection at verify time —
    // the dominant cost when the corpus shares vocabulary).
    // repartition first: shingling + k-function MinHash is the CPU-bound
    // stage, and a compact source (one parquet file) would otherwise pin
    // it to a single input partition
    val withShingles = spread(docs)
      .select(col(idCol).as("id"),
        array_sort(shingleHashes(col(textCol), shingleN)).as("shingles"))
      .withColumn("sig", minhashSignature(col("shingles"), k))
      .cache()
    val bandRows = withShingles
      .select(col("id"), posexplode(bandKeys(col("sig"), bands, rowsPerBand)))
      .select(col("id"), col("pos").as("band"), col("col").as("bkey"))
    // cap degenerate buckets BEFORE the self-join (skew guard)
    val okBuckets = bandRows.groupBy("band", "bkey").count()
      .filter(col("count") <= maxBucketSize && col("count") >= 2)
      .select("band", "bkey")
    val inBuckets = bandRows.join(okBuckets, Seq("band", "bkey"))
    val candidates = inBuckets.alias("a")
      .join(inBuckets.alias("b"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    // candidate pre-filter on the signature-estimated Jaccard BEFORE the
    // shingle arrays ship: the estimator's std is sqrt(J(1-J)/k) ≤
    // 0.5/√k, and only pairs estimated > 4σ BELOW threshold are pruned
    // (per-pair false-prune odds ~3e-5 at the threshold; exact Jaccard
    // still decides membership for everything that passes). In
    // boilerplate-heavy corpora the candidate mass sits at low true
    // Jaccard, so most candidates die on the 512-byte signatures instead
    // of dragging their ~kB shingle sets through the verify join.
    val estCutoff = math.max(0.0, threshold - 4 * 0.5 / math.sqrt(k))
    val corpusRows = withShingles.count() // materializes the cache anyway
    val sg = noBroadcastWhenLarge(
      withShingles.select(col("id"), col("sig")), corpusRows)
    val prefiltered = candidates
      .join(sg.select(col("id").as("id_a"), col("sig").as("sig_a")), "id_a")
      .join(sg.select(col("id").as("id_b"), col("sig").as("sig_b")), "id_b")
      .filter(equalSlotFraction(col("sig_a"), col("sig_b")) >= estCutoff)
      .select("id_a", "id_b")
    val sh = noBroadcastWhenLarge(
      withShingles.select(col("id"), col("shingles")), corpusRows)
    prefiltered
      .join(sh.withColumnRenamed("id", "id_a").withColumnRenamed("shingles", "sh_a"), "id_a")
      .join(sh.withColumnRenamed("id", "id_b").withColumnRenamed("shingles", "sh_b"), "id_b")
      .withColumn("jaccard", round(sortedLongJaccard(col("sh_a"), col("sh_b")), 6))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** LSH bucket-size distribution — observability for the skew cap. */
  def bucketStats(docs: DataFrame, idCol: String, textCol: String,
                  shingleN: Int = 3, k: Int = 64, bands: Int = 16): DataFrame = {
    require(bands > 0 && bands <= k && k % bands == 0,
      s"bands ($bands) must divide the signature length k ($k)")
    val rowsPerBand = k / bands
    docs.select(col(idCol).as("id"),
        minhashSignature(shingleHashes(col(textCol), shingleN), k).as("sig"))
      .select(col("id"), explode(bandKeys(col("sig"), bands, rowsPerBand)).as("bkey"))
      .groupBy("bkey").count()
      .groupBy(col("count").as("bucket_size")).agg(count(lit(1)).as("n_buckets"))
  }

  /** SimHash near-dup pairs: 64-bit signatures, candidates = equal 16-bit
    * sub-bands (any of 4), verified by Hamming distance <= maxHamming.
    * The sub-band trick bounds the self-join exactly like MinHash LSH.
    *
    * RECALL CONTRACT: by pigeonhole, 4 bands GUARANTEE candidate
    * generation only for hamming <= 3 (one band must be clean); pairs at
    * hamming 4..maxHamming are returned only when their diffs happen to
    * leave some band equal — increasingly likely for clustered diffs,
    * never certain. maxHamming is the VERIFY threshold, not a recall
    * guarantee; for guaranteed recall at larger distances, use the
    * MinHash path or lower the threshold to 3.
    */
  def simhashNearDups(docs: DataFrame, idCol: String, textCol: String,
                      shingleN: Int = 3, maxHamming: Int = 8,
                      maxBucketSize: Int = 200): DataFrame = {
    // spread + cache: signature computation is the CPU-bound stage and is
    // consumed four times (bucket census + both sides of the self-join)
    val sigs = spread(docs).select(col(idCol).as("id"),
      simhash64Native(shingleHashes(col(textCol), shingleN)).as("sig"))
      .cache()
    val banded = sigs.select(col("id"), col("sig"),
      posexplode(array((0 until 4).map(j =>
        shiftrightunsigned(col("sig"), j * 16).bitwiseAND(lit(0xffffL))): _*)))
      .select(col("id"), col("sig"), col("pos").as("band"), col("col").as("bkey"))
    // same degenerate-bucket guard as MinHash LSH: a shared-vocabulary
    // corpus concentrates simhash bands, and an uncapped bucket self-join
    // goes quadratic on exactly the least informative buckets
    val okBuckets = banded.groupBy("band", "bkey").count()
      .filter(col("count") <= maxBucketSize && col("count") >= 2)
      .select("band", "bkey")
    val inBuckets = banded.join(okBuckets, Seq("band", "bkey"))
    inBuckets.alias("a").join(inBuckets.alias("b"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        hamming64(col("a.sig"), col("b.sig")).as("hamming"))
      // filter BEFORE distinct: hamming is pair-deterministic, so the
      // dedup shuffle only carries surviving pairs
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Brute-force n-gram Jaccard pairs within blocking groups. Blocking on
    * (lang, length bucket) bounds the quadratic comparison to same-group
    * pairs — the exactness baseline the LSH variants are tested against.
    */
  /** Edit-distance near-duplicates, prefix-blocked: candidate pairs share
    * an exact md5 of the first `prefixLen` chars (near-dup corpora —
    * boilerplate headers, templated pages, small in-place edits — keep
    * prefixes stable), then the full-text Levenshtein filter keeps pairs
    * within `maxDist`. The quadratic work is bounded per block like
    * [[ngramJaccardPairs]]; `maxBucket` drops degenerate blocks (an
    * all-identical-prefix corpus must not explode the join) — dropped
    * blocks are the exact-dedup regime anyway, not the edit-distance one.
    *
    * Per-pair cost is O(len·maxDist), not O(len²): two cheap pre-filters
    * (a pair whose lengths differ by more than `maxDist` cannot be within
    * it; `maxDist` insertions cannot bridge a larger gap) run as join
    * conditions before any DP, and the DP itself is the THRESHOLDED
    * Levenshtein (`levenshtein(l, r, threshold)`) — a banded computation
    * that abandons a pair the moment every cell in the current band
    * exceeds the bound, returning -1. Kept pairs report the exact
    * distance, so the operator stays oracle-checkable cross-engine
    * (DedupSimilaritySpec pins banded ≡ plain DP under the filter).
    */
  def editDistanceNearDups(docs: DataFrame, idCol: String, textCol: String,
                           prefixLen: Int = 64, maxDist: Int = 8,
                           maxBucket: Int = 1000): DataFrame = {
    val keyed = spread(docs).select(col(idCol).as("id"),
      md5(substring(col(textCol), 1, prefixLen)).as("blk"),
      col(textCol).as("txt"), length(col(textCol)).as("len"))
    val small = keyed.groupBy(col("blk"))
      .agg(count(lit(1)).as("n")).filter(col("n") <= maxBucket)
      .select("blk")
    val sh0 = keyed.join(small, "blk").cache()
    // the join sides carry FULL document text — the corpus-side
    // broadcast trap pinned in [[noBroadcastWhenLarge]] applies with
    // extra force here (text compresses heavily in shuffle, so AQE's
    // estimate is most wrong exactly when the side is biggest)
    val sh = noBroadcastWhenLarge(sh0, sh0.count())
    sh.alias("a").join(sh.alias("b"),
        col("a.blk") === col("b.blk") && col("a.id") < col("b.id") &&
          abs(col("a.len") - col("b.len")) <= maxDist)
      .withColumn("lev", levenshtein(col("a.txt"), col("b.txt"), maxDist + 1))
      .filter(col("lev").between(0, maxDist))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"), col("lev"))
  }

  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                        blockCols: Seq[String], shingleN: Int = 3,
                        threshold: Double = 0.5): DataFrame = {
    // hashed-long shingle sets, sorted once per row: Jaccard identical up
    // to 64-bit collisions, per-pair cost is a codegen'd merge scan
    val sh = spread(docs).select((col(idCol).as("id") +: blockCols.map(col)) :+
      array_sort(shingleHashes(col(textCol), shingleN)).as("shingles"): _*)
      .cache()
    val cond = blockCols.map(c => col(s"a.$c") === col(s"b.$c"))
      .reduce(_ && _) && col("a.id") < col("b.id")
    sh.alias("a").join(sh.alias("b"), cond)
      .withColumn("jaccard",
        round(sortedLongJaccard(col("a.shingles"), col("b.shingles")), 6))
      .filter(col("jaccard") >= threshold)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"), col("jaccard"))
  }

  /** Benchmark decontamination: count, per corpus document, the distinct
    * word n-grams it shares with a benchmark/eval document set — the
    * training-data hygiene check that keeps eval data out of the corpus.
    *
    * Scale shape: the benchmark's distinct n-gram hash set is usually
    * small → broadcast; the corpus side explodes to (doc, gram) pairs and
    * the hash join is map-side, so cost is one pass over the corpus
    * shingles plus a (doc_id)-keyed count. Hashes are 64-bit (collision
    * odds negligible); only flagged docs are returned.
    */
  def decontaminate(docs: DataFrame, benchmark: DataFrame,
                    idCol: String, textCol: String,
                    ngramN: Int = 3): DataFrame = {
    def grams(df: DataFrame) = spread(df)
      .select(col(idCol).as("id"),
        explode(shingleHashes(col(textCol), ngramN)).as("g"))
    val benchGrams = broadcast(grams(benchmark).select("g").distinct())
    grams(docs)
      .join(benchGrams, "g")
      .groupBy(col("id").as(idCol))
      .agg(count(lit(1)).as("n_hits"))
  }

  /** Hyperplane-LSH candidate pairs over `tables` independent hyperplane
    * families of `signBits` bits each. Same skew-bounded shape as the
    * MinHash band join: only (table, bucket-key, id) triples flow into the
    * self-join, degenerate buckets are capped, vectors stay out until the
    * verify/rerank join. Per-pair candidate probability for vectors at
    * angle θ is `1 - (1 - (1-θ/π)^signBits)^tables` — add tables for
    * recall, add bits to shrink buckets.
    */
  private def hyperplaneCandidates(sigs: DataFrame, signBits: Int,
                                   tables: Int, maxBucketSize: Int): DataFrame = {
    val keyRows = sigs
      .select(col("id"),
        posexplode(hyperplaneKeysNative(col("v"), signBits, tables)))
      .select(col("id"), col("pos").as("tbl"), col("col").as("bkey"))
    val okBuckets = keyRows.groupBy("tbl", "bkey").count()
      .filter(col("count") <= maxBucketSize && col("count") >= 2)
      .select("tbl", "bkey")
    val inBuckets = keyRows.join(okBuckets, Seq("tbl", "bkey"))
    inBuckets.alias("a").join(inBuckets.alias("b"),
        col("a.tbl") === col("b.tbl") && col("a.bkey") === col("b.bkey") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
  }

  /** Embedding-cosine near-duplicates: pairs with cosine >= threshold.
    * Candidates are bounded by multi-table LSH over random hyperplane
    * signs when `signBits > 0` (same skew-bounded self-join shape as
    * simhash); signBits = 0 means exact all-pairs (test scale only).
    */
  /** @param signBits hyperplane-LSH bucket bits bounding the self-join —
    *   the scalable default. Pass 0 for EXACT all-pairs, which broadcasts
    *   one full side: test/small-corpus scale only (hard 8 GB broadcast
    *   ceiling).
    * @param tables   independent hyperplane families unioned for recall
    *   (signBits > 0 only). At the 0.95-cosine default, 8×8 bits gives
    *   ~99% per-pair recall.
    */
  def embeddingNearDups(embeddings: DataFrame, idCol: String, vecCol: String,
                        threshold: Double = 0.95, signBits: Int = 8,
                        tables: Int = 8, maxBucketSize: Int = 1000): DataFrame = {
    // zero-norm vectors (padding/empty rows) have no defined cosine; NaN
    // compares GREATER than any double in Spark ordering, so they would
    // otherwise pair with everything and crowd out real results
    val raw = embeddings.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("nrm", vectorNorm(col("v")))
      .filter(col("nrm") > 0.0)
    if (signBits <= 0) {
      // exact all-pairs: broadcast one (un-spread, single-scan) side and
      // let the spread stream side parallelize — a constant-bucket
      // equi-join would funnel every pair through one shuffle partition
      spread(raw).alias("a").crossJoin(broadcast(raw.alias("b")))
        .filter(col("a.id") < col("b.id"))
        .withColumn("cosine",
          round(vectorDot(col("a.v"), col("b.v")) / (col("a.nrm") * col("b.nrm")), 6))
        .filter(col("cosine") >= threshold)
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"), col("cosine"))
    } else {
      // key computation is the CPU-bound stage and feeds both the census
      // and the rerank joins — compute once
      val sigs = spread(raw).cache()
      val cands = hyperplaneCandidates(sigs, signBits, tables, maxBucketSize)
      val corpusRows = sigs.count() // materializes the cache anyway
      val side = noBroadcastWhenLarge(
        sigs.select(col("id"), col("v"), col("nrm")), corpusRows)
      cands
        .join(side.select(col("id").as("id_a"), col("v").as("va"), col("nrm").as("na")), "id_a")
        .join(side.select(col("id").as("id_b"), col("v").as("vb"), col("nrm").as("nb")), "id_b")
        .withColumn("cosine",
          round(vectorDot(col("va"), col("vb")) / (col("na") * col("nb")), 6))
        .filter(col("cosine") >= threshold)
        .select(col("id_a"), col("id_b"), col("cosine"))
    }
  }

  /** Top-k most-similar embedding pairs via multi-table hyperplane LSH
    * candidates → exact cosine rerank → global top-k. The scalable
    * replacement for ranking ALL pairs: the self-join is bounded by
    * bucket size and only candidate ids shuffle; no side is broadcast.
    *
    * Recall is probabilistic in general — on a corpus whose "most
    * similar" pairs sit at cosine c, per-pair candidate probability is
    * `1 - (1 - (1-acos(c)/π)^signBits)^tables`; size `tables` to the
    * corpus (defaults cover cosine ≥ ~0.4 pairs with ~99.9% recall).
    * For near-random corpora a sublinear method cannot guarantee exact
    * top-k; the brute-force path remains the exactness baseline.
    */
  def embeddingTopPairsLsh(embeddings: DataFrame, idCol: String, vecCol: String,
                           k: Int, signBits: Int = 4, tables: Int = 32,
                           maxBucketSize: Int = 100000): DataFrame = {
    require(signBits > 0 && tables > 0, "LSH path needs signBits, tables > 0")
    val raw = embeddings.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("nrm", vectorNorm(col("v")))
      .filter(col("nrm") > 0.0)
    val sigs = spread(raw).cache()
    val cands = hyperplaneCandidates(sigs, signBits, tables, maxBucketSize)
    val corpusRows = sigs.count() // materializes the cache anyway
    val side = noBroadcastWhenLarge(
      sigs.select(col("id"), col("v"), col("nrm")), corpusRows)
    cands
      .join(side.select(col("id").as("id_a"), col("v").as("va"), col("nrm").as("na")), "id_a")
      .join(side.select(col("id").as("id_b"), col("v").as("vb"), col("nrm").as("nb")), "id_b")
      .withColumn("cosine",
        round(vectorDot(col("va"), col("vb")) / (col("na") * col("nb")), 6))
      .orderBy(col("cosine").desc, col("id_a").asc, col("id_b").asc)
      .limit(k)
      .select(col("id_a"), col("id_b"), col("cosine"))
  }

  /** Exact dedup of an INCOMING batch against a REFERENCE corpus via a
    * broadcast Bloom prefilter — the incremental-ingest shape at scale:
    * the reference's fingerprint set is folded into a fixed-size Bloom
    * filter (built distributed, merged on the driver, broadcast once),
    * so the overwhelming majority of genuinely-new rows drop out of the
    * anti-join MAP-SIDE without shuffling; only Bloom-positive rows
    * (true dups + the fpp share of false positives) take the exact
    * anti-join shuffle. No false negatives: a row the Bloom rejects is
    * PROVABLY absent from the reference, so the result is exactly the
    * plain anti-join's — the filter only cuts shuffle volume.
    *
    * At a 100 TB history the Bloom is sized by the reference's DISTINCT
    * fingerprint count (~1.2 GB per 10^9 keys at 1% fpp) and built once
    * per maintenance cycle, amortized over every incoming batch.
    */
  def dedupAgainstReference(incoming: DataFrame, reference: DataFrame,
                            textCol: String,
                            fpp: Double = 0.01): DataFrame = {
    // FULL 128-bit md5 as the join fingerprint — a 64-bit truncation
    // collides at the advertised 10^9-key scale (birthday bound ~3%)
    // and a collision wrongly DROPS a genuinely-new row, breaking the
    // "exactly the plain anti-join's result" contract. The Bloom hashes
    // the string internally, so its size is unchanged by digest width.
    val in = spread(incoming).withColumn("__fp", md5(col(textCol)))
    // cached: the fingerprint projection feeds three passes (count,
    // Bloom build, exact anti-join); Verify/Bench clear per-query
    // caches, and the broadcast Bloom itself lives until the session
    // releases it — per maintenance cycle by design, not per batch
    val ref = spread(reference)
      .select(md5(col(textCol)).as("__fp")).cache()
    val n = math.max(1000L, ref.count())
    val bloom = ref.stat.bloomFilter("__fp", n, fpp)
    val b = incoming.sparkSession.sparkContext.broadcast(bloom)
    val might = org.apache.spark.sql.functions.udf(
      (fp: String) => fp != null && b.value.mightContain(fp))
    // bloom-negative rows are provably new — they skip the shuffle
    val provablyNew = in.filter(!might(col("__fp")))
    val suspects = in.filter(might(col("__fp")))
      .join(ref, Seq("__fp"), "left_anti") // exact confirm for the rest
    provablyNew.unionByName(suspects).drop("__fp")
  }

  /** Cross-corpus CHUNK-level exact dedup with reassembly (the
    * MassiveText/C4 repeated-passage removal shape): every document is
    * split into fixed non-overlapping character chunks, a chunk KEEPS
    * only its globally FIRST occurrence (ordered by (doc id, offset) —
    * deterministic and engine-portable), and each document is rebuilt
    * from its surviving chunks in offset order. Repeated boilerplate
    * shared across documents (and exact self-repetition within one)
    * disappears from every copy but the first.
    *
    * Scale shape: chunking is map-side Catalyst HOFs (sequence +
    * substring — no explode of words); the only shuffles are the
    * keep-first hash aggregation on the chunk text and the per-document
    * rebuild aggregation. No windows over the corpus, no sort. At 100 TB
    * hash the chunk text to a 128-bit digest for the group key and carry
    * the text only on the winner — the group-by stays the same shape.
    *
    * Output: (id, clean_text, n_chunks, n_kept) — one row per input
    * document; a fully-duplicated document survives with empty text.
    */
  def chunkDedup(docs: DataFrame, idCol: String, textCol: String,
                 chunkChars: Int = 64): DataFrame = {
    require(chunkChars > 0, "chunkChars must be positive")
    val base = spread(docs.select(col(idCol).as("id"), col(textCol).as("text")))
    val chunks = base
      .withColumn("start", explode(sequence(lit(0),
        greatest(length(col("text")) - 1, lit(0)), lit(chunkChars))))
      .withColumn("chunk_text",
        expr(s"substring(text, start + 1, $chunkChars)"))
      .select(col("id"), col("start"), col("chunk_text"))
    val firsts = chunks.groupBy(col("chunk_text"))
      .agg(min(struct(col("id"), col("start"))).as("keep"))
    val flagged = chunks.join(firsts, Seq("chunk_text"))
      .withColumn("kept", col("keep.id") === col("id") &&
        col("keep.start") === col("start"))
    flagged.groupBy(col("id"))
      .agg(
        concat_ws("", array_sort(collect_list(
          when(col("kept"), struct(col("start"), col("chunk_text")))))
          .getField("chunk_text")).as("clean_text"),
        count(lit(1)).as("n_chunks"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"))
  }

  /** ExactSubstr REMOVAL (Lee et al. 2022 §4.1 — the production pass
    * whose measurement twin is [[TextAnalysis.sharedWindowStats]], and
    * whose fixed-boundary cousin is [[chunkDedup]]): every n-token
    * window occurring more than once in the corpus keeps its FIRST
    * occurrence in corpus order (ordered by `(id, offset)`), every
    * token covered by any NON-first occurrence is removed, and each
    * document rebuilds from its surviving tokens in order. Tokens are
    * whitespace-split verbatim (case and punctuation preserved — this
    * is exact-substring, not normalized-gram, matching); rebuilt text
    * joins with single spaces. Documents shorter than `n` tokens pass
    * through untouched (no window to match); a fully-duplicated
    * document survives with empty text, like chunkDedup.
    *
    * Scale shape: the keep-first decision is ONE hash aggregation per
    * gram (min-struct + count, map-side combine); coverage explodes
    * ≤ n positions per DUPLICATE window only — proportional to the
    * contamination, not the corpus; the rebuild is the chunkDedup
    * collect_list aggregation per document. No corpus-wide window, no
    * global sort, no UDF. At 100 TB hash the gram text to a 128-bit
    * digest for the group/join key and carry text only on winners —
    * the shape is unchanged.
    *
    * Output: `(id, clean_text, n_tokens, n_removed)`, one row per
    * input document.
    */
  def exactSubstrRemove(docs: DataFrame, idCol: String, textCol: String,
                        n: Int = 8): DataFrame = {
    require(n >= 1, s"window size must be positive, got $n")
    val words = spread(docs.select(col(idCol).as("id"),
        col(textCol).as("text")))
      .select(col("id"),
        filter(split(trim(col("text")), "\\s+"), w => w =!= "").as("w"))
      .withColumn("n_tokens", size(col("w")).cast("long"))
      .cache()
    val grams = words.filter(col("n_tokens") >= n)
      .select(col("id"), explode(transform(
          sequence(lit(1), (col("n_tokens") - (n - 1)).cast("int")),
          i => struct((i - 1).cast("long").as("q"),
            array_join(slice(col("w"), i, lit(n)), " ").as("g")))).as("x"))
      .select(col("id"), col("x.q").as("q"), col("x.g").as("g"))
    val firsts = grams.groupBy(col("g"))
      .agg(min(struct(col("id"), col("q"))).as("keep"),
        count(lit(1)).as("occ"))
    val covered = grams.join(firsts, Seq("g"))
      .filter(col("occ") > 1 &&
        !(col("keep.id") === col("id") && col("keep.q") === col("q")))
      .select(col("id"),
        explode(sequence(col("q"), col("q") + (n - 1))).as("p"))
      .distinct()
    val pos = words.select(col("id"), posexplode(col("w")))
      .select(col("id"), col("pos").cast("long").as("p"),
        col("col").as("word"))
    val rebuilt = pos.join(covered, Seq("id", "p"), "left_anti")
      .groupBy(col("id"))
      .agg(concat_ws(" ",
          array_sort(collect_list(struct(col("p"), col("word"))))
            .getField("word")).as("clean_text"),
        count(lit(1)).as("kept"))
    words.select(col("id"), col("n_tokens"))
      .join(rebuilt, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        col("n_tokens"),
        (col("n_tokens") - coalesce(col("kept"), lit(0L))).as("n_removed"))
  }
}
