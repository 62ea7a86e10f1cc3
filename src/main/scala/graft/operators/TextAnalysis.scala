package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text analysis over a documents table (SURVEY.md §7.6): language ID,
  * quality scoring, token counting, fingerprinting. Every operator is a
  * narrow projection of codegen'd built-ins — no shuffle, no UDF — so it
  * scans at parquet-reader speed and scales linearly with input splits.
  *
  * All arithmetic is kept ANSI-SQL-expressible so the DuckDB oracle can
  * verify results value-for-value.
  */
object TextAnalysis {

  /** Occurrences of a marker substring, counted via length difference —
    * expressible identically in any SQL dialect (no regex dialect risk).
    */
  private def occurrences(text: Column, marker: String): Column =
    (length(text) - length(replace(text, lit(marker), lit("")))) / marker.length

  private def markerScore(padded: Column, markers: Seq[String]): Column =
    markers.map(m => occurrences(padded, s" $m ")).reduce(_ + _)

  /** Stopword-marker language ID (n-gram-heuristic family): counts
    * language-specific function words and picks the argmax with a fixed
    * priority order on ties. Deliberately simple + deterministic.
    */
  def langId(text: Column): Column = {
    val padded = concat(lit(" "), lower(text), lit(" "))
    val en = markerScore(padded, Seq("the", "and", "of", "to", "is"))
    val es = markerScore(padded, Seq("el", "la", "de", "que", "los"))
    val de = markerScore(padded, Seq("der", "und", "die", "das", "ist"))
    val fr = markerScore(padded, Seq("le", "et", "les", "des", "est"))
    // null text FIRST: every score below is null, so every `when`
    // predicate is null (not matched) and the otherwise() branch would
    // confidently report null documents as "fr"
    when(text.isNull, lit(null).cast("string"))
      .when(en >= es && en >= de && en >= fr, lit("en"))
      .when(es >= de && es >= fr, lit("es"))
      .when(de >= fr, lit("de"))
      .otherwise(lit("fr"))
  }

  /** Whitespace token count. */
  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0))
      .otherwise(size(split(trim(text), "\\s+")))

  /** BPE-ish subword count estimate: words + extra tokens for long words
    * (a word of length L costs ceil(L/4) tokens) — pure arithmetic, no
    * tokenizer dependency, same formula the oracle runs.
    */
  def subwordCountEstimate(text: Column): Column =
    aggregate(
      split(trim(text), "\\s+"),
      lit(0L),
      (acc, w) => acc + ceil(length(w).cast("double") / 4.0).cast("long"))

  /** Quality features: ratios of character classes + average word length.
    * Rounded to 6 decimals to keep cross-engine double formatting stable.
    */
  def qualityFeatures(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    // empty text: 0/0 is NaN, and NaN sorts ABOVE every double, so an
    // unguarded ratio turns the least/greatest clamp in qualityScore
    // into a PERFECT score for exactly the junk rows it should zero out
    val n = greatest(length(t).cast("double"), lit(1.0))
    def classRatio(pattern: String): Column =
      round(length(regexp_replace(t, pattern, "")).cast("double") / n, 6)
    df.withColumn("n_chars_m", length(t))
      .withColumn("alpha_ratio", classRatio("[^A-Za-z]"))
      .withColumn("digit_ratio", classRatio("[^0-9]"))
      .withColumn("punct_ratio", classRatio("[^.,;:!?]"))
      .withColumn("space_ratio", classRatio("[^ ]"))
      .withColumn("n_tokens", tokenCount(t))
      .withColumn("avg_word_len",
        round(length(regexp_replace(t, " ", "")).cast("double") /
          greatest(col("n_tokens").cast("double"), lit(1.0)), 6))
  }

  /** Scalar quality score in [0,1]: rewards alphabetic density and
    * mid-length words, penalizes digit/punct noise. Weighted linear model,
    * clamped. Exported as micro-units (score * 1e6, floored) — engines
    * disagree on decimal rounding of binary doubles at the half boundary,
    * but `floor(x*1e6 + 0.5)` of a bit-identical double is exact.
    */
  def qualityScore(df: DataFrame, textCol: String): DataFrame =
    qualityFeatures(df, textCol).withColumn("quality_score_e6",
      // null text scores 0 EXPLICITLY: the null ratios would otherwise
      // be skipped by least/greatest (both engines ignore null args) and
      // the clamp would hand null documents the maximum score
      when(col(textCol).isNull, lit(0L)).otherwise(
        floor(greatest(lit(0.0), least(lit(1.0),
          col("alpha_ratio") * 0.6
            + col("space_ratio") * 1.2
            - col("digit_ratio") * 0.8
            - col("punct_ratio") * 0.5
            + least(col("avg_word_len"), lit(8.0)) / 16.0)) * 1000000.0 + 0.5)
          .cast("long")))

  /** Gopher quality rules (Rae et al. 2021, Appendix A — the rule set
    * MassiveWeb filtered on), as EXACT INTEGER signals plus the
    * combined pass flag. Every threshold is a division-free integer
    * comparison (mean word length ∈ [3,10] ⟺ 3·n ≤ Σlen ≤ 10·n, the
    * ratio bounds cross-multiplied), so both engines decide every
    * boundary identically — no float ratio ever materializes. Pure
    * columnar map-side projection: no shuffle, no UDF, no window.
    *
    * Rules: word count ∈ [minWords, maxWords]; mean word length ∈
    * [3, 10]; symbol-to-word ratio (`#` and `...`) ≤ 1/10; at most
    * 90% of non-empty lines start with a bullet (`-`/`*`/`•`) and at
    * most 30% end with an ellipsis; ≥ 80% of words contain an
    * alphabetic character; ≥ 2 distinct members of the stop-word set
    * appear (Gopher's classic octet by default — parameterized because
    * the rule is per-language). Null text scores all-zero and fails.
    */
  def gopherQualityRules(df: DataFrame, idCol: String, textCol: String,
                         minWords: Int = 50,
                         maxWords: Int = 100000,
                         stopWords: Seq[String] = Seq("the", "be", "to",
                           "of", "and", "that", "have", "with")): DataFrame = {
    val t = coalesce(col(textCol), lit(""))
    val w = filter(split(trim(t), "\\s+"), x => x =!= "")
    val ls = filter(split(t, "\n"), l => trim(l) =!= "")
    val stops = array(stopWords.map(lit): _*)
    df.select(
        col(idCol),
        size(w).cast("long").as("n_words"),
        aggregate(w, lit(0L), (a, x) => a + length(x)).as("sum_word_len"),
        size(filter(w, x => x.rlike("[A-Za-z]"))).cast("long")
          .as("n_alpha_words"),
        size(ls).cast("long").as("n_lines"),
        size(filter(ls, l => substring(ltrim(l), 1, 1).isin("-", "*", "•")))
          .cast("long").as("n_bullet_lines"),
        size(filter(ls, l => endswith(rtrim(l), lit("...")) ||
            endswith(rtrim(l), lit("…")))).cast("long")
          .as("n_ellipsis_lines"),
        ((length(t) - length(replace(t, lit("#"), lit("")))).cast("long") +
          ((length(t) - length(replace(t, lit("..."), lit("")))) / 3)
            .cast("long")).as("n_symbols"),
        size(array_intersect(array_distinct(transform(w, x => lower(x))),
          stops)).cast("long").as("stop_hits"))
      .withColumn("gopher_pass",
        col("n_words") >= minWords && col("n_words") <= maxWords &&
          col("sum_word_len") >= lit(3L) * col("n_words") &&
          col("sum_word_len") <= lit(10L) * col("n_words") &&
          lit(10L) * col("n_symbols") <= col("n_words") &&
          lit(10L) * col("n_bullet_lines") <= lit(9L) * col("n_lines") &&
          lit(10L) * col("n_ellipsis_lines") <= lit(3L) * col("n_lines") &&
          lit(10L) * col("n_alpha_words") >= lit(8L) * col("n_words") &&
          col("stop_hits") >= 2L)
  }

  /** Document fingerprint: md5 of the whitespace-normalized lowercase text
    * — the exact-dedup key. (The rolling/locality-sensitive variants live
    * in [[Dedup]].)
    */
  def fingerprint(text: Column): Column =
    md5(trim(regexp_replace(lower(text), "\\s+", " ")))

  /** Fixed-size character chunking with overlap — the pre-tokenization
    * split of a training pipeline. One row per chunk with its index and
    * start offset. Pure `sequence`+`explode`+`substring`: row count grows,
    * no shuffle, and the explode parallelizes with the scan.
    */
  def chunk(df: DataFrame, idCol: String, textCol: String,
            chunkSize: Int, overlap: Int): DataFrame = {
    require(overlap < chunkSize, "overlap must be smaller than chunkSize")
    val step = chunkSize - overlap
    df.select(col(idCol), col(textCol))
      .withColumn("chunk_start",
        explode(sequence(lit(0), greatest(length(col(textCol)) - 1, lit(0)), lit(step))))
      .withColumn("chunk_idx", (col("chunk_start") / step).cast("int"))
      .withColumn("chunk_text",
        substring_index_safe(col(textCol), col("chunk_start"), chunkSize))
      .withColumn("chunk_len", length(col("chunk_text")))
      .drop(textCol)
  }

  // substring with 0-based start column (Spark's substring builtin needs a
  // literal start; expr-level substring accepts columns, 1-based)
  private def substring_index_safe(text: Column, start0: Column, len: Int): Column =
    text.substr(start0 + 1, lit(len))

  /** Deterministic stratified sampling: keep a row iff a fixed integer
    * hash of its id lands under the per-mille rate. Reproducible across
    * runs and engines (Knuth multiplicative hash, no RNG), map-side only.
    */
  def sampleDeterministic(idCol: String, perMille: Int): Column =
    // reduce mod a large prime BEFORE the Knuth multiply: ids above
    // ~3.4e9 would overflow the long product, an ERROR under Spark 4's
    // default ANSI mode (and in DuckDB) — exactly the id range a large
    // corpus has. Identical selection for ids below the prime.
    pmod(pmod(col(idCol), lit(1000000007L)) * lit(2654435761L), lit(1000L)) <
      perMille

  /** Conservative email pattern shared by Spark (Java regex) and the
    * DuckDB oracle (RE2) — character classes and bounded quantifiers
    * only, no dialect-specific syntax.
    */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Phone-ish pattern: 7+ digit runs with optional separators. */
  val PhonePattern = "\\+?[0-9][0-9()\\- ]{6,}[0-9]"

  /** PII scrubbing: replace emails/phones with typed placeholders and
    * count the redactions. Map-side regex over codegen'd built-ins —
    * linear scan, no shuffle; the corpus-hygiene pass a training pipeline
    * runs before anything else. Email replacement runs first so phone
    * patterns never match inside an already-redacted address.
    */
  def piiScrub(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    // regex-heavy map-side op with NO shuffle of its own: spread off
    // single-split sources or the whole scan runs in one task
    val emailScrubbed = regexp_replace(t, EmailPattern, "<EMAIL>")
    Dedup.spread(df).select(col(idCol),
      regexp_count(t, lit(EmailPattern)).as("n_emails"),
      // phones counted on the email-REDACTED text, like the fingerprint:
      // counting on raw text reports a redaction that never happens when
      // a phone-like digit run sits inside an email's local part
      regexp_count(emailScrubbed, lit(PhonePattern)).as("n_phones"),
      md5(regexp_replace(emailScrubbed, PhonePattern, "<PHONE>"))
        .as("scrubbed_fp"))
  }

  /** Repetition metrics (the MassiveText/Gopher-style quality signals):
    * per document, the fraction of duplicate tokens and the share of the
    * single most frequent token. Formulated RELATIONALLY — explode to
    * (doc, token), count, re-aggregate — so the shuffle is keyed by
    * (doc, token) with map-side partial aggregation; no per-row
    * frequency map allocation, and the same SQL runs in the oracle.
    * Micro-unit outputs sidestep cross-engine double rounding. Documents
    * with zero tokens are omitted (no defined ratio).
    */
  def repetitionMetrics(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // tokenization runs BEFORE the (doc, token) shuffle — spread it
    val toks = Dedup.spread(df).select(col(idCol),
        explode(split(trim(regexp_replace(lower(col(textCol)),
          "[^a-z0-9]+", " ")), " ")).as("tok"))
      .filter(col("tok") =!= "")
    toks.groupBy(col(idCol), col("tok")).agg(count(lit(1)).as("cnt"))
      .groupBy(col(idCol))
      .agg(sum("cnt").as("n_tokens"),
        count(lit(1)).as("n_distinct_tokens"),
        max("cnt").as("top_cnt"))
      .select(col(idCol), col("n_tokens"), col("n_distinct_tokens"),
        floor((lit(1.0) - col("n_distinct_tokens").cast("double") /
          col("n_tokens").cast("double")) * 1000000.0 + 0.5).cast("long")
          .as("dup_token_e6"),
        floor(col("top_cnt").cast("double") /
          col("n_tokens").cast("double") * 1000000.0 + 0.5).cast("long")
          .as("top_token_share_e6"))
  }

  /** N-GRAM repetition metrics (the Gopher duplicate-n-gram rules —
    * [[repetitionMetrics]]'s token signals generalized to word n-grams):
    * per document, the total n-gram occurrences, the most frequent
    * n-gram's count, the share of occurrences covered by that top gram
    * ("fraction of characters in the most frequent n-gram" analog on a
    * uniform word stream), and the fraction of occurrences whose gram
    * appears more than once (the duplicate-n-gram fraction). Same
    * relational shape as the token metrics — explode to (doc, gram),
    * count with map-side partial aggregation, re-aggregate — and the
    * gram construction is pure columnar (sequence + slice inside a
    * higher-order transform; no UDF, no per-row map). Outputs are
    * counts and micro-units only (tie-free, hash-safe across engines).
    * Documents with fewer than `n` words are omitted (no defined gram).
    */
  def ngramRepetitionMetrics(df: DataFrame, idCol: String, textCol: String,
                             n: Int = 2): DataFrame = {
    require(n >= 1, s"n-gram size must be positive, got $n")
    val grams = wordGrams(df, idCol, textCol, n)
    grams.groupBy(col(idCol), col("g")).agg(count(lit(1)).as("cnt"))
      .groupBy(col(idCol))
      .agg(sum("cnt").as("n_grams"),
        max("cnt").as("top_cnt"),
        sum(when(col("cnt") > 1, col("cnt")).otherwise(lit(0L)))
          .as("dup_occ"))
      .select(col(idCol), col("n_grams"), col("top_cnt"),
        floor(col("top_cnt").cast("double") /
          col("n_grams").cast("double") * 1000000.0 + 0.5).cast("long")
          .as("top_gram_share_e6"),
        floor(col("dup_occ").cast("double") /
          col("n_grams").cast("double") * 1000000.0 + 0.5).cast("long")
          .as("dup_gram_e6"))
  }

  /** One (id, gram) row per word n-gram occurrence: q55's tokenizer,
    * windows built with sequence+slice inside a higher-order transform
    * — pure Column API (no SQL-string interpolation of the column
    * name), no UDF. Tokenization runs BEFORE the gram-keyed shuffles,
    * so it spreads off single-split sources. Docs with fewer than `n`
    * words emit nothing.
    */
  private def wordGrams(df: DataFrame, idCol: String, textCol: String,
                        n: Int): DataFrame =
    Dedup.spread(df).select(col(idCol),
        filter(split(trim(regexp_replace(lower(col(textCol)),
          "[^a-z0-9]+", " ")), " "), x => x =!= "").as("w"))
      .filter(size(col("w")) >= n)
      .select(col(idCol), explode(
        transform(sequence(lit(1), size(col("w")) - (n - 1)),
          i => array_join(slice(col("w"), i, lit(n)), " "))).as("g"))

  /** CROSS-DOCUMENT shared-window statistics (the ExactSubstr-dedup
    * signal of "Deduplicating Training Data Makes Language Models
    * Better", Lee et al. 2022, reduced to fixed word windows): per
    * document, how many of its n-token windows also occur in ANOTHER
    * document — the span-level contamination [[ngramRepetitionMetrics]]
    * (intra-doc) can't see. Relational shape: window → (gram, doc)
    * occurrence counts → a count-over-gram window marks grams seen in
    * ≥2 docs → re-aggregate per doc. Both shuffles are gram-keyed with
    * map-side partial aggregation; the per-gram window partition is
    * bounded by the doc count, so a stopword-run gram can't skew a
    * task unboundedly. Documents with fewer than `n` words are omitted.
    */
  def sharedWindowStats(df: DataFrame, idCol: String, textCol: String,
                        n: Int = 8): DataFrame = {
    require(n >= 1, s"window size must be positive, got $n")
    import org.apache.spark.sql.expressions.Window
    val grams = wordGrams(df, idCol, textCol, n)
    val perDocGram = grams.groupBy(col("g"), col(idCol))
      .agg(count(lit(1)).as("occ"))
    val docsPerGram = Window.partitionBy(col("g"))
    perDocGram
      .withColumn("n_docs", count(lit(1)).over(docsPerGram))
      .groupBy(col(idCol))
      .agg(sum("occ").as("n_windows"),
        sum(when(col("n_docs") > 1, col("occ")).otherwise(lit(0L)))
          .as("n_shared_windows"))
      .select(col(idCol), col("n_windows"), col("n_shared_windows"),
        floor(col("n_shared_windows").cast("double") /
          col("n_windows").cast("double") * 1000000.0 + 0.5).cast("long")
          .as("shared_window_e6"))
  }

  /** Token-stream sequence packing (GPT-style): documents are concatenated
    * shard-by-shard in id order and chopped into fixed token budgets;
    * each document learns which packed sequence it starts in and at what
    * offset. Sharding bounds every window partition (shard = id mod
    * nShards) so the running sum never funnels through one task — the
    * packing a 100 TB tokenization job would emit, with per-shard
    * determinism and no global sort.
    */
  def packSequences(df: DataFrame, idCol: String, textCol: String,
                    tokenBudget: Int, nShards: Int = 8): DataFrame = {
    require(tokenBudget > 0 && nShards > 0, "budget and shards must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy(col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    // token counting runs before the shard shuffle — spread it
    Dedup.spread(df)
      .select(col(idCol), tokenCount(col(textCol)).cast("long").as("n_tokens"))
      .withColumn("shard", pmod(col(idCol), lit(nShards.toLong)))
      .withColumn("start_tok",
        sum("n_tokens").over(w) - col("n_tokens"))
      .select(col(idCol), col("shard"), col("n_tokens"),
        (col("start_tok") / tokenBudget).cast("long").as("pack_idx"),
        pmod(col("start_tok"), lit(tokenBudget.toLong)).as("pack_offset"))
  }

  /** STUPID-BACKOFF bigram LM quality scoring (Brants et al. 2007; the
    * LM-perplexity filter of the CCNet pipeline, Wenzek et al. 2020,
    * reduced to a bigram model trained in-engine): train unigram/bigram
    * counts on a REFERENCE slice, then score every document per token —
    *
    *   S(w_i | w_{i-1}) = c(w_{i-1} w_i) / ctx(w_{i-1})   if the bigram
    *                                                      was observed
    *                    = alpha * (c(w_i) / N)             otherwise
    *                                                      (0 for OOV)
    *
    * with the first token scored `c(w_1)/N` and `ctx(w)` = observed
    * bigram positions opening with `w`. Per-token scores quantize to
    * integer MICRO-UNITS BEFORE aggregation: every step (count ratio,
    * alpha multiply, ×1e6, +0.5, floor) is a correctly-rounded IEEE
    * double op — bit-identical in any engine — and integer sums are
    * order-independent, which is what keeps a DuckDB oracle hash-green
    * where a log-domain perplexity (libm `ln` differs in ulps across
    * engines, and float sums depend on order) could not be. Ranking is
    * monotone with the probability-domain likelihood: higher avg =
    * more in-model.
    *
    * Output: (idCol, n_tokens, lm_sum_e6, lm_avg_e6) — avg by integer
    * division. Empty documents are omitted (nothing to score).
    *
    * Scale shape: tokenization is map-side off spread splits; training
    * is two gram-keyed aggregations with map-side partial combine
    * (O(vocab)/O(bigram-vocab) results, corpus-size-independent);
    * scoring is three equi-joins against the LM tables — broadcast when
    * small, and at reference-corpus scale the planner's shuffle-hash
    * path keys on the token columns. No UDF, no window, no collect.
    */
  def lmScore(docs: DataFrame, train: DataFrame, idCol: String,
              textCol: String, alpha: Double = 0.4): DataFrame = {
    def toks(df: DataFrame) = Dedup.spread(df).select(col(idCol),
        filter(split(trim(regexp_replace(lower(col(textCol)),
          "[^a-z0-9]+", " ")), " "), x => x =!= "").as("w"))
      .filter(size(col("w")) >= 1)
    def pairs(df: DataFrame) = df.filter(size(col("w")) >= 2)
      .select(col(idCol), explode(
        transform(sequence(lit(1), size(col("w")) - 1),
          i => struct(element_at(col("w"), i).as("w1"),
            element_at(col("w"), i + 1).as("w2")))).as("p"))
      .select(col(idCol), col("p.w1").as("w1"), col("p.w2").as("w2"))
    val trainW = toks(train)
    val uni = trainW.select(explode(col("w")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("c_uni")).cache()
    // total training tokens: derived from the cached unigram table so
    // the training corpus tokenizes exactly once
    val n = uni.agg(sum(col("c_uni"))).head.getLong(0)
    require(n > 0, "LM training slice holds no tokens")
    val bi = pairs(trainW).groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("c_bi")).cache()
    // ctx(w1) = bigram positions opening with w1 — folded from the
    // bigram table (already aggregated), never a second corpus pass
    val ctx = bi.groupBy(col("w1")).agg(sum(col("c_bi")).as("c_ctx"))
    def e6(s: Column): Column =
      floor(s * 1000000.0 + 0.5).cast("long")
    // ONE pass over the scored corpus: every token position i emits
    // (prev = w_{i-1} or NULL at i=1, tok = w_i) from a single explode
    // — the dominant cost (regex tokenization + the spread shuffle)
    // must not run once per scoring branch when docs >> train. A NULL
    // prev never equi-joins, so the first-position branch below is
    // selected by prev IS NULL, not by a separate lineage.
    val positions = toks(docs).select(col(idCol), explode(
        transform(sequence(lit(1), size(col("w"))),
          i => struct(
            when(i === 1, lit(null).cast("string"))
              .otherwise(element_at(col("w"), i - 1)).as("w1"),
            element_at(col("w"), i).as("w2")))).as("p"))
      .select(col(idCol), col("p.w1").as("w1"), col("p.w2").as("w2"))
    positions
      .join(bi, Seq("w1", "w2"), "left")
      .join(ctx, Seq("w1"), "left")
      .join(uni.select(col("tok").as("w2"), col("c_uni").as("c_uni2")),
        Seq("w2"), "left")
      .select(col(idCol), e6(
        when(col("w1").isNull, // first token: unigram, no alpha
          coalesce(col("c_uni2"), lit(0L)).cast("double")
            / lit(n).cast("double"))
          .when(col("c_bi").isNotNull,
            col("c_bi").cast("double") / col("c_ctx").cast("double"))
          .otherwise(lit(alpha) *
            (coalesce(col("c_uni2"), lit(0L)).cast("double")
              / lit(n).cast("double")))).as("s_e6"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"), sum(col("s_e6")).as("lm_sum_e6"))
      .select(col(idCol), col("n_tokens"), col("lm_sum_e6"),
        expr("lm_sum_e6 DIV n_tokens").as("lm_avg_e6"))
  }

  /** CCNet's head/middle/tail corpus split (Wenzek et al. 2020 §4.3):
    * per language, rank documents by LM score (best first) and cut the
    * ranking in integer thirds — `rank·3 ≤ n` = head,
    * `rank·3 ≤ 2n` = middle, else tail. Pure integer arithmetic on a
    * deterministic total order (score desc, id asc): no percentile
    * interpolation, so any engine buckets identically. Input is
    * [[lmScore]]'s output joined with a language column; `groupCol`
    * partitions the ranking (CCNet buckets per language so
    * low-resource languages aren't drowned by the dominant one).
    *
    * Scale note: the ranking window sorts per language — fine while no
    * single language dominates a 100 TB corpus beyond what a range
    * sort handles; the approximation-tolerant variant (percentile_approx
    * thresholds + a map-side bucket compare, no window) trades exact
    * thirds for zero sort, same trade as q63's GK-sketch percentiles.
    */
  def ccnetBuckets(scored: DataFrame, idCol: String, scoreCol: String,
                   groupCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col(scoreCol).desc, col(idCol).asc)
    val n = Window.partitionBy(col(groupCol))
    scored
      .withColumn("rnk", row_number().over(w))
      .withColumn("n_grp", count(lit(1)).over(n))
      .withColumn("bucket",
        when(col("rnk") * 3 <= col("n_grp"), lit("head"))
          .when(col("rnk") * 3 <= col("n_grp") * 2, lit("middle"))
          .otherwise(lit("tail")))
      .drop("rnk", "n_grp")
  }

  /** Cross-group n-gram overlap matrix: for every pair of groups
    * (sources, dumps, shards), the Jaccard similarity of their distinct
    * word-n-gram SETS — the corpus-level contamination/redundancy map a
    * mixture designer reads before weighting sources (two crawls of the
    * same sites show up as a high-Jaccard pair; a benchmark-shaped
    * source lights up against the eval dump). Group-level cousin of the
    * doc-level [[sharedWindowStats]].
    *
    * Relational shape: distinct (group, gram) → per-group set sizes +
    * a gram-keyed self-join counting co-occurring group pairs. The
    * per-gram join fan-out is bounded by the GROUP count (≤ C(groups,2)
    * pairs per gram), not the corpus size, so at 100 TB the cost is the
    * distinct-gram shuffle — the same class as every dedup pass here —
    * never all-pairs over documents. Pairs sharing no gram are absent
    * from the output (they'd be zero rows × quadratic pairs).
    *
    * Output: `(group_a, group_b, common_grams, union_grams,
    * jaccard_e6)` with `group_a < group_b`, Jaccard in integer
    * micro-units ([[sharedWindowStats]]' float rule).
    */
  def crossGroupOverlap(df: DataFrame, groupCol: String, textCol: String,
                        n: Int = 3): DataFrame = {
    require(n >= 1, s"gram size must be positive, got $n")
    val gs = wordGrams(df, groupCol, textCol, n).distinct().cache()
    val sizes = gs.groupBy(col(groupCol)).agg(count(lit(1)).as("__n"))
    val inter = gs.as("a").join(gs.as("b"), Seq("g"))
      .filter(col(s"a.$groupCol") < col(s"b.$groupCol"))
      .groupBy(col(s"a.$groupCol").as("group_a"),
        col(s"b.$groupCol").as("group_b"))
      .agg(count(lit(1)).as("common_grams"))
    inter
      .join(broadcast(sizes.withColumnRenamed(groupCol, "group_a")
        .withColumnRenamed("__n", "__na")), Seq("group_a"))
      .join(broadcast(sizes.withColumnRenamed(groupCol, "group_b")
        .withColumnRenamed("__n", "__nb")), Seq("group_b"))
      .select(col("group_a"), col("group_b"), col("common_grams"),
        (col("__na") + col("__nb") - col("common_grams")).as("union_grams"))
      .withColumn("jaccard_e6",
        floor(col("common_grams").cast("double") /
          col("union_grams").cast("double") * 1000000.0 + 0.5).cast("long"))
  }
  /** Unicode cleanup pass — the normalization a training pipeline runs
    * BEFORE any hashing/dedup operator: the same visible text arrives
    * composed ('é') and decomposed ('e'+U+0301) from different crawls,
    * and exact/MinHash/fingerprint dedup would treat the spellings as
    * distinct documents. Three codegen'd steps per row, no shuffle:
    * Unicode NFC ([[graft.functions.TextFunctions.nfc]] — JDK
    * Normalizer, composed canonical form), whitespace collapse (BEFORE
    * the control strip, so newlines/tabs become word separators instead
    * of silently joining words), then the strip of the remaining
    * non-whitespace control characters. Emits before/after codepoint
    * counts and a was_denormalized flag (text that was not already NFC)
    * so the pipeline can census how dirty a source is.
    */
  def unicodeClean(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    import graft.functions.TextFunctions
    val nfcd = TextFunctions.nfc(col(textCol))
    val collapsed = regexp_replace(nfcd, "\\s+", " ")
    val cleaned = trim(regexp_replace(collapsed, "\\p{Cc}", ""))
    df.select(col(idCol),
      cleaned.as("clean_text"),
      length(col(textCol)).cast("long").as("n_chars_raw"),
      length(cleaned).cast("long").as("n_chars_clean"),
      (nfcd =!= col(textCol)).as("was_denormalized"))
  }

  /** BM25 relevance of every document against a fixed query-term set
    * (Robertson & Zaragoza 2009; k1 = 1.2, b = 0.75 — the classic
    * constants, folded into EXACT integer fractions), the retrieval
    * scorer a corpus-curation pipeline uses to pull topical slices.
    * Per (doc, term): `idf_e3 = (N+1)·1000 DIV (df+1)` (the rational
    * (N+1)/(df+1) idf — a LINEAR variant of the log idf, the DSIR
    * precedent: log is not correctly-rounded cross-engine, a ratio is)
    * and `tfpart_e3 = 22·T·tf·1000 DIV (10·T·tf + 3·T + 9·dl·N)`,
    * which is `tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))` with
    * `avgdl = T/N` cleared of ALL divisions (×10T). The document score
    * is `Σ_t idf_e3·tfpart_e3` — every step 64-bit exact, so any
    * engine replays it bit-for-bit. Scale shape: one tokenize pass,
    * per-doc×term tf computed in-row (terms ride a literal array —
    * no corpus join), df a |terms|-row aggregate broadcast back;
    * nothing shuffles but the tiny df table.
    *
    * Emits (id, dl, n_hit_terms, score_e6) for documents matching at
    * least one term.
    */
  def bm25Score(docs: DataFrame, idCol: String, textCol: String,
                terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty, "bm25Score needs at least one query term")
    val toks = docs.select(col(idCol),
      filter(split(lower(trim(coalesce(col(textCol), lit("")))), "\\s+"),
        x => x =!= "").as("w"))
      .withColumn("dl", size(col("w")).cast("long"))
      .cache()
    val totals = toks.agg(count(lit(1)).as("n"), sum(col("dl")).as("t"))
      .head
    val n = totals.getLong(0)
    val tTot = totals.getLong(1)
    val hits = toks
      .select(col(idCol), col("dl"),
        explode(array(terms.distinct.map(lit): _*)).as("t"),
        col("w"))
      .withColumn("tf",
        size(filter(col("w"), x => x === col("t"))).cast("long"))
      .filter(col("tf") > 0)
      .drop("w")
    val dfTab = hits.groupBy(col("t")).agg(count(lit(1)).as("df"))
    hits.join(broadcast(dfTab), Seq("t"))
      .withColumn("idf_e3",
        expr(s"(${n}L + 1) * 1000 DIV (df + 1)"))
      .withColumn("tfpart_e3",
        expr(s"22 * ${tTot}L * tf * 1000 DIV " +
          s"(10 * ${tTot}L * tf + 3 * ${tTot}L + 9 * dl * ${n}L)"))
      .groupBy(col(idCol))
      .agg(first(col("dl")).as("dl"),
        count(lit(1)).as("n_hit_terms"),
        sum(col("idf_e3") * col("tfpart_e3")).as("score_e6"))
  }

  /** C4-style LINE-level cleaning (Raffel et al. 2020 §2.2, the rules
    * the Common Crawl pipelines share; FineWeb keeps the same shape):
    * a line SURVIVES iff it ends in a terminal punctuation mark
    * (`.` `!` `?` `"` `'` after trailing-whitespace strip), carries at
    * least `minLineWords` whitespace words, and contains none of the
    * `badLinePhrases` (case-insensitive substring — C4's "javascript"
    * rule). The DOCUMENT survives iff at least `minKeptLines` lines
    * remain AND the whole text contains none of the `docKillPhrases`
    * (C4 drops pages containing "lorem ipsum" or a curly brace
    * outright, killing the page rather than the line). Phrase sets are
    * parameterized like [[gopherQualityRules]]'s stop words — the
    * published lists are English-web-specific.
    *
    * Emits per document: the rebuilt text of surviving lines (original
    * order, `\n`-joined), line censuses, and the document pass flag.
    * Pure codegen'd projection — the line algebra runs inside the row
    * via higher-order array functions, so the operator scans at reader
    * speed with no shuffle and no UDF at any corpus size.
    */
  def lineFilter(df: DataFrame, idCol: String, textCol: String,
                 minLineWords: Int = 3,
                 minKeptLines: Int = 2,
                 badLinePhrases: Seq[String] = Seq("javascript",
                   "cookie policy", "terms of use"),
                 docKillPhrases: Seq[String] = Seq("lorem ipsum", "{")):
      DataFrame = {
    require(minLineWords >= 1 && minKeptLines >= 1,
      "line-filter thresholds must be positive")
    val t = coalesce(col(textCol), lit(""))
    val ls = filter(split(t, "\n"), l => trim(l) =!= "")
    def keeps(l: Column): Column = {
      val words = size(filter(split(trim(l), "\\s+"), x => x =!= ""))
      val terminal = substring(rtrim(l), -1, 1)
        .isin(".", "!", "?", "\"", "'")
      val bad = badLinePhrases.map(p => contains(lower(l), lit(p)))
        .reduce(_ || _)
      terminal && words >= minLineWords && !bad
    }
    val kept = filter(ls, keeps(_))
    val killed = docKillPhrases.map(p => contains(lower(t), lit(p)))
      .reduce(_ || _)
    df.select(col(idCol),
        size(ls).cast("long").as("n_lines"),
        size(kept).cast("long").as("n_kept_lines"),
        array_join(kept, "\n").as("clean_text"),
        killed.as("doc_killed"))
      .withColumn("line_pass",
        !col("doc_killed") && col("n_kept_lines") >= minKeptLines)
  }
}
