package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-pipeline column builders: normalization, tokenization, shingling,
  * MinHash signatures, SimHash. All are compositions of codegen'd built-in
  * functions except where noted; each is a deterministic pure function of
  * its input so results are reproducible across runs and cluster sizes
  * (SURVEY.md §7.6 — LLM-data-pipeline operators).
  */
object TextFunctions {

  /** Lowercase, strip non-alphanumerics to spaces, collapse whitespace. */
  def normalize(text: Column): Column =
    trim(regexp_replace(lower(text), "[^a-z0-9]+", " "))

  /** Whitespace tokens of the normalized text.
    *
    * FUSED (r15): one regex `split` on the separator-class complement
    * replaces the old regexp_replace → trim → split(" ") chain — the
    * same token list without materializing the normalized string per
    * row (the chain runs per document inside every shingle expression).
    * Exact equivalence with the old form, proven property-wise in
    * TextFunctionsSpec and by the oracle over the 13 shingle consumers:
    *   - a run of non-alphanumerics is one separator either way;
    *   - leading/trailing separators produce leading/trailing EMPTY
    *     fragments under split (Spark keeps trailing empties,
    *     limit = -1), filtered out exactly as the old trim+collapse
    *     dropped them;
    *   - a document with NO alphanumeric at all normalized to "" and
    *     split to [""] under the old form — the `when` reproduces that
    *     single-empty-token sentinel bit-for-bit (size guards and
    *     element hashes downstream see identical input);
    *   - NULL stays NULL (split/filter/when all propagate).
    */
  def tokens(text: Column): Column =
    bindOnce(filter(split(lower(text), "[^a-z0-9]+"), x => x =!= ""), r =>
      when(size(r) === 0, array(lit(""))).otherwise(r))

  /** Evaluate an expensive array expression ONCE and let `f` reference it
    * any number of times: Catalyst performs no common-subexpression
    * elimination INSIDE one expression tree, so an array subtree referenced
    * k times (size guards, element_at probes, slices) re-runs its whole
    * lineage — lower + regex + split + hash — k times per row. Binding the
    * array as a single-element `transform` lambda variable makes every
    * reference read the one computed value (measured: the token-hash array
    * in [[shingleHashes]] appears ~6×; ICU lowercasing alone was 35 s of
    * q35's executor time before the binding).
    */
  private def bindOnce(arr: Column, f: Column => Column): Column =
    get(transform(array(arr), a => f(a)), lit(0))

  /** Word n-gram shingles: sliding windows of `n` tokens joined by a
    * space. `transform(sequence(...))` keeps this in Catalyst (array ops),
    * no UDF. Returns an empty array when the document has < n tokens.
    */
  def wordShingles(text: Column, n: Int): Column =
    bindOnce(tokens(text), toks =>
      when(size(toks) >= n,
        transform(sequence(lit(0), size(toks) - n),
          i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
        .otherwise(array().cast("array<string>")))

  /** 64-bit hashes of each DISTINCT word n-gram, computed numerically:
    * every token is hashed ONCE (xxhash64), and each sliding window
    * combines its n token hashes with position-dependent bit rotations +
    * XOR. No shingle string is ever materialized — the old
    * concat_ws-then-hash path allocated one string per window and
    * dominated near-dup CPU (it was ~20% of the whole benchmark).
    * Bitwise mixing keeps the expression ANSI-safe (no overflow) and
    * order-sensitive (rotation distance depends on the position), and two
    * documents produce equal hashes exactly for equal token windows — the
    * property MinHash/Jaccard need. Collisions are as harmless as in the
    * string-hash form: candidates are verified by exact merge-scan
    * Jaccard downstream.
    */
  def shingleHashes(text: Column, n: Int): Column = {
    def rot(c: Column, r: Int): Column =
      if (r == 0) c
      else shiftleft(c, r).bitwiseOR(shiftrightunsigned(c, 64 - r))
    // the token-hash array is referenced ~6 times below (two size guards,
    // n element_at probes per window) — bindOnce keeps the
    // lower+regex+split+hash lineage at ONE evaluation per row
    val windows = bindOnce(transform(tokens(text), t => xxhash64(t)), th =>
      when(size(th) >= n,
        transform(sequence(lit(0), size(th) - n),
          i => (0 until n).map(j =>
              rot(element_at(th, i + lit(j + 1)), (j * 21) % 64))
            .reduce(_ bitwiseXOR _)))
        .otherwise(array().cast("array<bigint>")))
    array_distinct(windows)
  }

  /** Large prime modulus for the universal-hash family. */
  final val MinHashPrime = 2147483647L // 2^31 - 1 (Mersenne)

  /** Deterministic multiplier/offset pairs for the k-function MinHash
    * family h_i(x) = ((a_i * x + b_i) mod p). Constants are fixed odd
    * multipliers derived from the function index — reproducible everywhere
    * with no RNG state.
    */
  def minhashParams(k: Int): Seq[(Long, Long)] =
    (0 until k).map { i =>
      val a = 2L * (i * 0x9E3779B9L % 1048573L) + 1 // odd, well spread
      val b = (i * 0x85EBCA6BL + 0x165667B1L) % MinHashPrime
      (a, b)
    }

  /** MinHash signature: array of k minima over the shingle-hash set.
    * Codegen'd single-pass expression ([[MinHashSignatureExpr]]); empty
    * shingle sets get the max sentinel p in every slot.
    */
  def minhashSignature(shingleHashCol: Column, k: Int): Column =
    org.apache.spark.sql.GraftBridge.column(
      MinHashSignatureExpr(
        org.apache.spark.sql.GraftBridge.expression(shingleHashCol), k))

  /** The higher-order-function formulation of [[minhashSignature]] — kept
    * (test-only) as the executable specification the codegen'd expression
    * must equal.
    */
  private[graft] def minhashSignatureHof(shingleHashCol: Column, k: Int): Column = {
    val p = MinHashPrime
    val mins = minhashParams(k).map { case (a, b) =>
      coalesce(
        array_min(transform(shingleHashCol,
          h => pmod(pmod(h, lit(p)) * a + b, lit(p)))),
        lit(p))
    }
    array(mins: _*)
  }

  /** LSH band keys: the signature split into `bands` groups of `rowsPerBand`
    * values, each group hashed to one long — docs sharing any band key are
    * near-dup candidates.
    */
  def bandKeys(signature: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map { j =>
      xxhash64(lit(j), concat_ws(",",
        slice(signature, j * rowsPerBand + 1, rowsPerBand).cast("array<string>")))
    }: _*)

  /** 64-bit SimHash from an array of shingle hashes: per-bit majority vote.
    * Implemented as a Scala UDF (per-row loop over 64 bits x shingles) —
    * acceptable here because the array is small and the alternative is 64
    * aggregate expressions; a TypedImperativeAggregate would be the
    * cluster-scale form for streaming accumulation.
    */
  val simhash64: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { hashes: Seq[Long] =>
      if (hashes == null || hashes.isEmpty) 0L
      else {
        val counts = new Array[Int](64)
        hashes.foreach { h =>
          var b = 0
          while (b < 64) {
            if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
            b += 1
          }
        }
        var out = 0L
        var b = 0
        while (b < 64) {
          if (counts(b) > 0) out |= (1L << b)
          b += 1
        }
        out
      }
    }

  /** Hamming distance between two 64-bit simhashes (codegen'd built-ins). */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Exact Jaccard similarity of two string-array columns (set semantics). */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b))
    val uni = size(array_union(a, b))
    when(uni === 0, lit(0.0)).otherwise(inter.cast("double") / uni.cast("double"))
  }

  /** Unicode NFC normalization (canonical composition) — what a training
    * pipeline runs before ANY hashing/dedup step: the same visible text
    * arrives in composed ('é') and decomposed ('e'+U+0301) spellings from
    * different crawls, and every exact/MinHash/fingerprint operator in
    * this engine would otherwise treat them as distinct documents.
    * Codegen'd static call into the JDK's `java.text.Normalizer` (no new
    * deps); deterministic — the Unicode canonical-composition tables are
    * version-stable for assigned codepoints.
    */
  def nfc(text: Column): Column =
    org.apache.spark.sql.GraftBridge.column(NfcNormalize(
      org.apache.spark.sql.GraftBridge.catalystExpression(text)))
}

/** `java.text.Normalizer.normalize(s, NFC)` as a codegen'd expression —
  * per-row string normalization stays inside whole-stage codegen.
  */
case class NfcNormalize(child: org.apache.spark.sql.catalyst.expressions.Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
  import org.apache.spark.sql.types.{DataType, StringType}
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"
  override def nullSafeEval(a: Any): Any =
    org.apache.spark.unsafe.types.UTF8String.fromString(NfcNormalize.nfc(
      a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s =>
      "org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.functions.NfcNormalize.nfc($s.toString()))")
  override protected def withNewChildInternal(
      c: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.catalyst.expressions.Expression = copy(child = c)
}

object NfcNormalize {
  /** Static so generated code can call it. Fast path: NFC-normalized
    * text (the overwhelming majority) is RECOGNIZED without allocating —
    * `Normalizer.isNormalized` is a scan, `normalize` builds a new
    * string.
    */
  def nfc(s: String): String =
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) s
    else java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)
}
