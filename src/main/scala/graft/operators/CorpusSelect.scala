package graft.operators

import graft.Q
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The capstone of the LLM-training-data surface (SURVEY §2c): the
  * actual corpus-selection pass a training pipeline runs, COMPOSED
  * from the already-oracle-checked stages —
  *
  *   keep a document iff it is English (text_langid), clears the
  *   quality threshold (text_quality), and is the keeper of its
  *   near-dup cluster (dedup_clusters' connected components).
  *
  * Each stage is a join/anti-join over the documents fact, so the
  * whole selection is one declarative plan: Catalyst fuses the
  * narrow quality/langid projections into a single pass over the
  * scan and the drop-list anti-join is the only extra shuffle. At
  * 100 TB this is the shape you want — selection as a plan, not a
  * sequence of materialized intermediate tables.
  */
object CorpusSelect {

  private val minQuality = 0.5

  private def corpusSelect(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val quality = TextAnalysis.textQuality(spark, dir)
      .select($"doc_id", $"quality_score", $"n_tokens")
    val lang = TextAnalysis.textLangid(spark, dir)
      .select($"doc_id", $"pred_lang")
    val dropList = Dedup.nonKeepers(spark, dir)
      .select($"id".as("doc_id"))
    quality.join(lang, "doc_id")
      .filter($"pred_lang" === "en" && $"quality_score" >= minQuality)
      .join(dropList, Seq("doc_id"), "left_anti")
      .select($"doc_id", $"pred_lang", $"quality_score", $"n_tokens")
      .orderBy($"doc_id")
  }

  private val corpusSelectSql =
    s"""WITH RECURSIVE
       |${Dedup.clusterWalkSql},
       |q AS (${TextAnalysis.textQualitySql}),
       |l AS (${TextAnalysis.textLangidSql}),
       |drop_list AS (SELECT id AS doc_id FROM comp WHERE id <> cluster_id)
       |SELECT q.doc_id, l.pred_lang, q.quality_score, q.n_tokens
       |FROM q JOIN l ON l.doc_id = q.doc_id
       |WHERE l.pred_lang = 'en' AND q.quality_score >= $minQuality
       |  AND q.doc_id NOT IN (SELECT doc_id FROM drop_list)
       |ORDER BY q.doc_id""".stripMargin

  val all: Seq[Q] = Seq(
    Q("llm_corpus_select", corpusSelect, Some(corpusSelectSql))
  )
}
