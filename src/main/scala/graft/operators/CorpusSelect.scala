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

  // ---- llm_decontaminate: benchmark n-gram overlap flagging ----
  // THE pipeline step between corpus and training run: any training
  // document sharing enough shingles with the held-out eval/benchmark
  // set is flagged (training on eval == silently inflated scores).
  // Eval membership is a deterministic ~1% slice (doc_id % 97 == 13 —
  // in production, the benchmark corpus is its own table on the same
  // posting schema). Overlap = DISTINCT discriminative shingles
  // shared (the df-capped posting: boilerplate shingles must not
  // flag). This corpus tokenizes short, so the shingle order is 3 and
  // the threshold 3 shared shingles; production decontamination runs
  // the same plan at 8-13-gram order with threshold 1.
  //
  // Scale shape: equi-join on the df-capped shingle key (per-shingle
  // fanout ≤ cap × eval postings), two counting aggregates — no
  // broadcast anywhere; the eval side is corpus-proportional (1%)
  // and stays shuffled.

  private val evalMod = 97
  private val evalRes = 13
  private val minSharedShingles = 3

  private def decontaminate(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val posting = Dedup.shinglePosting(spark, dir)
    val evalPost = posting.filter($"doc_id" % evalMod === evalRes)
      .select($"doc_id".as("eval_id"), $"shingle")
    val trainPost = posting.filter($"doc_id" % evalMod =!= evalRes)
    trainPost.join(evalPost, "shingle")
      .groupBy($"doc_id")
      .agg(countDistinct($"shingle").as("n_shared_shingles"),
        countDistinct($"eval_id").as("n_eval_docs"))
      .filter($"n_shared_shingles" >= minSharedShingles)
      .orderBy($"doc_id")
  }

  private val decontaminateSql =
    s"""WITH ${Dedup.postingSqlCtes},
       |ev AS (SELECT doc_id AS eval_id, sh FROM posting
       |       WHERE doc_id % $evalMod = $evalRes),
       |tr AS (SELECT doc_id, sh FROM posting
       |       WHERE doc_id % $evalMod <> $evalRes)
       |SELECT tr.doc_id,
       |  COUNT(DISTINCT tr.sh) AS n_shared_shingles,
       |  COUNT(DISTINCT ev.eval_id) AS n_eval_docs
       |FROM tr JOIN ev ON ev.sh = tr.sh
       |GROUP BY tr.doc_id
       |HAVING COUNT(DISTINCT tr.sh) >= $minSharedShingles
       |ORDER BY tr.doc_id""".stripMargin

  // ---- llm_sample_mix: deterministic stratified mixture sampling ----
  // The "data mixing" knob: per-language sampling rates (per mille)
  // applied via the cross-engine rolling hash of the doc id — pure
  // row-local arithmetic, so the sample is reproducible on any
  // executor, any engine, any run, and resampling with new rates
  // never reshuffles previously-kept documents within a stratum
  // (hash-threshold sampling is monotone in the rate). Strata come
  // from the catalog `lang` column — the declared metadata, as
  // distinct from text_langid's PREDICTED language used by
  // llm_corpus_select's filter.

  private val mixRates: Seq[(String, Int)] =
    Seq("en" -> 600, "de" -> 300, "fr" -> 300, "es" -> 300, "zh" -> 150)
  private val mixDefaultRate = 100

  private def sampleMix(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val mixKey = graft.functions.RollingHash.rolling_hash(
      concat(lit("mix|"), $"doc_id".cast("string"))) % 1000L
    val rate = mixRates.foldLeft(lit(mixDefaultRate)) {
      case (acc, (l, r)) => when($"lang" === l, lit(r)).otherwise(acc)
    }
    graft.Tables(spark, dir).documents
      .select($"doc_id", $"lang", $"source",
        mixKey.as("mix_key"), rate.as("mix_rate"))
      .filter($"mix_key" < $"mix_rate")
      .orderBy($"doc_id")
  }

  private val sampleMixSql = {
    val rateCase = mixRates
      .map { case (l, r) => s"WHEN '$l' THEN $r" }
      .mkString("CASE lang ", " ", s" ELSE $mixDefaultRate END")
    s"""SELECT * FROM (
       |  SELECT doc_id, lang, source,
       |    ${graft.functions.RollingHash.sql("'mix|' || CAST(doc_id AS VARCHAR)")} % 1000 AS mix_key,
       |    $rateCase AS mix_rate
       |  FROM documents)
       |WHERE mix_key < mix_rate
       |ORDER BY doc_id""".stripMargin
  }

  val all: Seq[Q] = Seq(
    Q("llm_corpus_select", corpusSelect, Some(corpusSelectSql)),
    Q("llm_decontaminate", decontaminate, Some(decontaminateSql)),
    Q("llm_sample_mix", sampleMix, Some(sampleMixSql))
  )
}
