package graft.operators

import graft.{Q, Tables}
import graft.functions.TextFunctions._
import graft.functions.VectorFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Deduplication operators for the training-data pipeline (SURVEY
  * §2c): exact, n-gram Jaccard, MinHash+LSH, SimHash, and
  * embedding-cosine near-dup.
  *
  * Scale design: nothing here is O(n²) over the corpus. Candidate
  * pairs always come from an equi-join on a blocking key (length
  * band, LSH band hash, SimHash chunk, cluster label), so the
  * shuffle is hash-partitioned on the block key and pair generation
  * is bounded per bucket. The expensive similarity math runs only on
  * candidates.
  */
object Dedup {

  // ---- dedup_exact: content-hash group-by ----

  private def dedupExact(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir).documents
      .groupBy(md5($"text").as("content_hash"))
      .agg(count(lit(1)).as("n_copies"), min($"doc_id").as("keeper_doc_id"))
      .orderBy($"content_hash")
  }

  private val dedupExactSql =
    """SELECT md5(text) AS content_hash,
      |  COUNT(*) AS n_copies,
      |  MIN(doc_id) AS keeper_doc_id
      |FROM documents
      |GROUP BY content_hash
      |ORDER BY content_hash""".stripMargin

  // ---- dedup_ngram_jaccard: 3-gram shingle Jaccard within length bands ----

  private def dedupNgram(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val s = Tables(spark, dir).documents
      .select($"doc_id", ($"n_chars" / 200).cast("int").as("band"),
        shingles3($"text").as("sh"))
    val a = s.select($"doc_id".as("a_id"), $"band", $"sh".as("a_sh"))
    val b = s.select($"doc_id".as("b_id"), $"band".as("b_band"), $"sh".as("b_sh"))
    a.join(b, $"band" === $"b_band" && $"a_id" < $"b_id")
      .withColumn("jaccard",
        size(array_intersect($"a_sh", $"b_sh")).cast(DoubleType) /
          size(array_union($"a_sh", $"b_sh")).cast(DoubleType))
      .filter($"jaccard" >= 0.5)
      .select($"a_id", $"b_id", $"jaccard")
      .orderBy($"a_id", $"b_id")
  }

  private val dedupNgramSql =
    """WITH s AS (
      |  SELECT doc_id, CAST(n_chars // 200 AS INTEGER) AS band,
      |    list_distinct(list_transform(
      |      range(1, greatest(len(string_split(text, ' ')) - 1, 1)),
      |      i -> string_split(text, ' ')[i] || ' ' ||
      |           string_split(text, ' ')[i+1] || ' ' ||
      |           string_split(text, ' ')[i+2])) AS sh
      |  FROM documents)
      |SELECT a_id, b_id, jaccard FROM (
      |  SELECT a.doc_id AS a_id, b.doc_id AS b_id,
      |    CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
      |      CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE) AS jaccard
      |  FROM s a JOIN s b ON a.band = b.band AND a.doc_id < b.doc_id)
      |WHERE jaccard >= 0.5
      |ORDER BY a_id, b_id""".stripMargin

  // ---- dedup_minhash_lsh: MinHash signatures + banded LSH join ----
  // k=16 hashes, 8 bands × 2 rows: recall ≈ 1 - (1-J²)⁸ — ≥ 0.9999999
  // at J=0.9 — at the cost of more low-J candidates, which the exact
  // shingle-Jaccard verification step then discards (precision 1).
  // Candidates = docs sharing any band hash; the band-key equi-join
  // replaces the all-pairs comparison, so shuffle volume is
  // bands × docs, never n². (Not SQL-expressible 1:1 in DuckDB →
  // rows-only check.)

  private def dedupMinhash(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables(spark, dir).documents
      .select($"doc_id", shingles3($"text").as("sh"))
      .filter(size($"sh") > 0)
    val sigs = docs.select($"doc_id", $"sh", minhashSig($"sh", 16).as("sig"))
    val bands = sigs.select($"doc_id", $"sh",
        posexplode(transform(sequence(lit(0), lit(7)),
          b => md5(concat_ws(",",
            transform(slice($"sig", b * 2 + 1, lit(2)),
              x => x.cast("string")))))))
      .withColumnRenamed("pos", "band_idx")
      .withColumnRenamed("col", "band_hash")
    val a = bands.select($"band_idx", $"band_hash", $"doc_id".as("a_id"), $"sh".as("a_sh"))
    val b = bands.select($"band_idx".as("b_idx"), $"band_hash".as("b_hash"),
      $"doc_id".as("b_id"), $"sh".as("b_sh"))
    a.join(b, $"band_idx" === $"b_idx" && $"band_hash" === $"b_hash" &&
        $"a_id" < $"b_id")
      .select($"a_id", $"b_id", $"a_sh", $"b_sh").distinct()
      .withColumn("jaccard",
        size(array_intersect($"a_sh", $"b_sh")).cast(DoubleType) /
          size(array_union($"a_sh", $"b_sh")).cast(DoubleType))
      .filter($"jaccard" >= 0.5)
      .select($"a_id", $"b_id", $"jaccard")
      .orderBy($"a_id", $"b_id")
  }

  // ---- dedup_simhash: 64-bit SimHash, banded hamming candidates ----
  // Candidates share at least one of four 16-bit chunks (guarantees
  // recall for hamming distance ≤ 3 by pigeonhole; good recall to
  // ~8). Rows-only check.

  private def dedupSimhash(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    def chunk(sig: org.apache.spark.sql.Column, k: Int) =
      call_function("shiftright", sig, lit(16 * k)).bitwiseAND(lit(0xFFFFL))
    val docs = Tables(spark, dir).documents
      .select($"doc_id", simhash64(tokens($"text")).as("sig"))
    val chunks = docs.select($"doc_id", $"sig",
      posexplode(array((0 to 3).map(k => chunk($"sig", k)): _*)))
      .withColumnRenamed("pos", "chunk_idx")
      .withColumnRenamed("col", "chunk_val")
    val a = chunks.select($"chunk_idx", $"chunk_val", $"doc_id".as("a_id"), $"sig".as("a_sig"))
    val b = chunks.select($"chunk_idx".as("b_idx"), $"chunk_val".as("b_val"),
      $"doc_id".as("b_id"), $"sig".as("b_sig"))
    a.join(b, $"chunk_idx" === $"b_idx" && $"chunk_val" === $"b_val" &&
        $"a_id" < $"b_id")
      .select($"a_id", $"b_id",
        bit_count($"a_sig".bitwiseXOR($"b_sig")).cast(LongType).as("hamming"))
      .distinct()
      .filter($"hamming" <= 12)
      .orderBy($"a_id", $"b_id")
  }

  // ---- dedup_embedding: cosine near-dup, blocked by cluster label ----
  // Top-20 most similar same-label pairs (the synthetic corpus has
  // no planted embedding dups, so a fixed top-k keeps the check
  // non-empty at every SF).

  private def dedupEmbedding(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val v = Tables(spark, dir).embeddings
      .select($"vec_id", $"label", $"embedding",
        VectorFunctions.norm($"embedding").as("nrm"))
    val a = v.select($"vec_id".as("a_id"), $"label",
      $"embedding".as("a_e"), $"nrm".as("a_n"))
    val b = v.select($"vec_id".as("b_id"), $"label".as("b_label"),
      $"embedding".as("b_e"), $"nrm".as("b_n"))
    a.join(b, $"label" === $"b_label" && $"a_id" < $"b_id")
      .select($"a_id", $"b_id",
        (VectorFunctions.dot($"a_e", $"b_e") / ($"a_n" * $"b_n")).as("cosine"))
      .orderBy($"cosine".desc, $"a_id", $"b_id")
      .limit(20)
  }

  private val dedupEmbeddingSql =
    s"""WITH v AS (
       |  SELECT vec_id, label, embedding AS e,
       |    ${VectorFunctions.normSql("embedding")} AS nrm
       |  FROM embeddings)
       |SELECT a.vec_id AS a_id, b.vec_id AS b_id,
       |  ${VectorFunctions.dotSql("a.e", "b.e", 64)} / (a.nrm * b.nrm) AS cosine
       |FROM v a JOIN v b ON a.label = b.label AND a.vec_id < b.vec_id
       |ORDER BY cosine DESC, a_id, b_id
       |LIMIT 20""".stripMargin

  val all: Seq[Q] = Seq(
    Q("dedup_exact", dedupExact, Some(dedupExactSql)),
    Q("dedup_ngram_jaccard", dedupNgram, Some(dedupNgramSql)),
    Q("dedup_minhash_lsh", dedupMinhash, None),
    Q("dedup_simhash", dedupSimhash, None),
    Q("dedup_embedding", dedupEmbedding, Some(dedupEmbeddingSql))
  )
}
