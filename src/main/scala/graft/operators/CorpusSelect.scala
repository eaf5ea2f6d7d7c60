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
  * The quality and langid columns are ROW-LOCAL projections stacked
  * on one scan of documents (withQuality ∘ withLangid — no join
  * between them), so the drop-list anti-join is the plan's only
  * shuffle. At 100 TB this is the shape you want — selection as one
  * declarative plan over a single corpus pass, not a sequence of
  * materialized intermediate tables. (The DuckDB oracle joins the
  * stage CTEs instead — same rows, oracle clarity over oracle
  * physics.)
  */
object CorpusSelect {

  private val minQuality = 0.5

  private def corpusSelect(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val scored = TextAnalysis.withLangid(
      TextAnalysis.withQuality(graft.Tables(spark, dir).documents))
    // The drop-list is every doc that loses its near-dup cluster —
    // O(duplicate count) ≈ O(corpus) in the worst case — so it must
    // NEVER be a broadcast build side: a corpus-proportional
    // broadcast OOMs driver and executors at 100 TB. A shuffled hash
    // anti-join keeps both sides distributed and hash-partitioned on
    // doc_id (ids-only build rows, ~16 bytes each through the
    // exchange); SHUFFLE_HASH also skips the sort a stats-less
    // checkpointed side would otherwise be given under sort-merge.
    val dropList = Dedup.nonKeepers(spark, dir)
      .select($"id".as("doc_id")).hint("shuffle_hash")
    scored
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
