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
    when(en >= es && en >= de && en >= fr, lit("en"))
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
    val n = length(t).cast("double")
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
      floor(greatest(lit(0.0), least(lit(1.0),
        col("alpha_ratio") * 0.6
          + col("space_ratio") * 1.2
          - col("digit_ratio") * 0.8
          - col("punct_ratio") * 0.5
          + least(col("avg_word_len"), lit(8.0)) / 16.0)) * 1000000.0 + 0.5)
        .cast("long"))

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
    pmod(col(idCol) * lit(2654435761L), lit(1000L)) < perMille
}
