package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Composed training-data pipelines: the individual operators chained the
  * way a corpus-preparation job would run them. Each stage is a narrow
  * projection or a single keyed shuffle; the composition introduces no
  * extra shuffles beyond its stages (predicates push through the joins).
  */
object Pipelines {

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
    val scored = TextAnalysis.qualityScore(
        docs.select(col(idCol), col(textCol)), textCol)
      .select(col(idCol), col("quality_score_e6"))
    val withLang = docs.select(col(idCol),
      TextAnalysis.langId(col(textCol)).as("lang_pred"))
    survivors
      .join(scored, idCol)
      .join(withLang, idCol)
      .filter(col("quality_score_e6") >= minQualityE6 &&
        col("lang_pred").isin(langs.map(x => x: Any): _*))
  }
}
