package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Composed training-data pipelines: the individual operators chained the
  * way a corpus-preparation job would run them. Each stage is a narrow
  * projection or a single keyed shuffle; the composition introduces no
  * extra shuffles beyond its stages (predicates push through the joins).
  */
object Pipelines {

  /** Near-dup CLUSTER resolution at scale: MinHash-LSH pair edges →
    * connected components → `(doc_id, component)` per document appearing
    * in any near-dup pair. The LSH-fed variant of q53's pipeline: the
    * blocked-brute pair source stays the oracle-checkable baseline (its
    * quadratic-within-block cost is the point of the check), this is the
    * 100 TB swap — banded bucket joins bounded by `maxBucketSize`, never
    * all-pairs. AsOfGraphSpec pins cluster equality between the two pair
    * sources on a planted corpus; ScaleProbe's `dedup_clusters_cc` stage
    * times exactly this composition at 500k docs.
    */
  def dedupClustersLsh(docs: DataFrame, idCol: String, textCol: String,
                       threshold: Double = 0.5,
                       maxBucketSize: Int = 200): DataFrame =
    Graph.connectedComponents(
      Dedup.minhashNearDups(docs, idCol, textCol, threshold = threshold,
        maxBucketSize = maxBucketSize),
      "id_a", "id_b")
      .select(col("id_a").as(idCol), col("component"))

  /** Semantic deduplication (the SemDeDup shape): embedding-cosine
    * near-dup pair edges → connected components → keep ONE representative
    * (minimum id) per semantic cluster. Near-duplication chains, so the
    * sweep is component-based: A≈B and B≈C drop B AND C for A even when
    * A·C sits below the threshold. Returns one row per INPUT id —
    * `(id, component, kept)` — the full sweep map a downstream filter
    * joins against.
    *
    * At scale: pairs come from the multi-table hyperplane LSH path
    * (bucketed, never all-pairs — [[Dedup.embeddingNearDups]]'s design
    * notes), components contract through [[Graph.connectedComponents]],
    * and the final left join is a hash join on the id. The pair recall
    * story is q58's: table count sized to the threshold's per-pair miss
    * probability.
    */
  def semanticDedup(embeddings: DataFrame, idCol: String, vecCol: String,
                    threshold: Double = 0.5, signBits: Int = 5,
                    tables: Int = 64): DataFrame = {
    val pairs = Dedup.embeddingNearDups(embeddings, idCol, vecCol,
      threshold = threshold, signBits = signBits, tables = tables)
      .select("id_a", "id_b")
    val comp = Graph.connectedComponents(pairs, "id_a", "id_b")
      .withColumnRenamed("id_a", idCol)
    embeddings.select(col(idCol))
      .join(comp, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("component"), col(idCol)).as("component"))
      .withColumn("kept", col("component") === col(idCol))
  }

  /** Corpus cleaning: exact-dedup survivors that pass a quality threshold
    * and a language allowlist. Returns one row per surviving document with
    * its quality score and predicted language.
    *
    * At scale: the dedup aggregate shuffles (doc fingerprint → min id)
    * once; quality + language-ID are map-side projections computed only
    * for survivors (the join prunes first).
    */
  def corpusClean(docs: DataFrame, idCol: String, textCol: String,
                  minQualityE6: Long = 990000L,
                  langs: Seq[String] = Seq("en", "es", "de", "fr")): DataFrame = {
    val survivors = Dedup.exact(docs, idCol, textCol).select(col(idCol))
    // join survivors FIRST, then compute both regex-heavy feature sets in
    // ONE projection over the pruned frame: Catalyst can't push a
    // semi-join below projections, so scoring before the join would run
    // the quality regexes and language markers over every duplicate the
    // dedup stage exists to discard (most of the corpus, in the
    // motivating case)
    val pruned = docs.select(col(idCol), col(textCol)).join(survivors, idCol)
    TextAnalysis.qualityScore(pruned, textCol)
      .withColumn("lang_pred", TextAnalysis.langId(col(textCol)))
      .select(col(idCol), col("quality_score_e6"), col("lang_pred"))
      .filter(col("quality_score_e6") >= minQualityE6 &&
        col("lang_pred").isin(langs.map(x => x: Any): _*))
  }
}
