package graft.operators

import graft.{Q, Tables}
import graft.Out._
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
  * band, LSH band hash, SimHash block pair, hyperplane sign bucket),
  * so the shuffle is hash-partitioned on the block key and pair
  * generation is bounded per bucket. The expensive similarity math
  * runs only on candidates.
  */
object Dedup {

  // ---- dedup_exact: content-hash group-by ----

  private def dedupExact(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir).documents
      .groupBy(md5($"text").as("content_hash"))
      .agg(count(lit(1)).as("n_copies"), min($"doc_id").as("keeper_doc_id"))
      .resultOrder($"content_hash")
  }

  private val dedupExactSql =
    """SELECT md5(text) AS content_hash,
      |  COUNT(*) AS n_copies,
      |  MIN(doc_id) AS keeper_doc_id
      |FROM documents
      |GROUP BY content_hash
      |ORDER BY content_hash""".stripMargin

  // ---- dedup_canonical: normalize-then-hash dedup ----
  // The first pass of every LLM-corpus dedup stack: case-fold, strip
  // punctuation, collapse whitespace, THEN hash — catching the
  // trivially-reformatted copies exact dedup misses. Pure narrow
  // projection + one hash-keyed aggregate; same shuffle profile as
  // dedup_exact.

  private[graft] def canonical(c: org.apache.spark.sql.Column) =
    graft.functions.CanonicalText.canonical_text(c)

  /** The regexp_replace form [[canonical]] fuses (kept as the
    * cross-engine reference: PropertySpec pins kernel == this form;
    * the DuckDB oracle stays on [[canonicalSqlExpr]]).
    */
  private[graft] def canonicalRegex(c: org.apache.spark.sql.Column) =
    trim(regexp_replace(regexp_replace(lower(c), "[^a-z0-9 ]", ""), " +", " "))

  /** DuckDB twin of [[canonical]] (global-flag regex replaces). */
  private[operators] def canonicalSqlExpr(e: String): String =
    s"trim(regexp_replace(regexp_replace(lower($e), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))"

  private def dedupCanonical(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir).documents
      .groupBy(md5(canonical($"text")).as("canonical_hash"))
      .agg(count(lit(1)).as("n_docs"),
        min($"doc_id").as("keeper_doc_id"),
        countDistinct(md5($"text")).as("n_distinct_raw"))
      .resultOrder($"canonical_hash")
  }

  private val dedupCanonicalSql =
    """SELECT
      |  md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS canonical_hash,
      |  COUNT(*) AS n_docs,
      |  MIN(doc_id) AS keeper_doc_id,
      |  COUNT(DISTINCT md5(text)) AS n_distinct_raw
      |FROM documents
      |GROUP BY canonical_hash
      |ORDER BY canonical_hash""".stripMargin

  // ---- dedup_url: URL-canonicalization dedup ----
  // The FIRST dedup pass of every web-crawl pipeline runs before any
  // content is even fetched twice: canonicalize the URL (case-fold
  // host, strip scheme + www, drop tracking parameters, normalize the
  // trailing slash) and collapse crawl records that differ only in
  // those cosmetic dimensions. Row-local regexp_replace chain + one
  // hash-keyed aggregate — identical shuffle profile to dedup_exact,
  // so the 100 TB story is the same scan-and-aggregate.
  //
  // The synthetic corpus carries no URL column, so — the established
  // pattern of llm_pii_scrub — the query DRIVES the canonicalizer
  // over a deterministic crawl URL constructed from catalog fields,
  // in TWO syntactic forms (scheme/www presence, tracking-param
  // order, trailing slash) that canonicalize to the SAME normal
  // form: the cross-form collisions are exactly what the operator
  // exists to catch. The form is selected by (doc_id div 100) % 2
  // and every varying URL part is a function of (source,
  // doc_id % 100) ONLY — source is itself doc_id-mod-periodic with a
  // period dividing 100 — so docs N and N+100 emit the same logical
  // URL through OPPOSITE syntactic forms and MUST collide after
  // canonicalization (DedupSpec asserts a mixed-form group exists; a
  // parity-coupled choice like doc_id % 2 with a %100 path would
  // make the two form populations disjoint and the central claim
  // vacuous). Pattern dialect: the java.util.regex ∩ RE2 subset (no
  // lookaround/backrefs).

  private[graft] def crawlUrl(doc_id: org.apache.spark.sql.Column,
      source: org.apache.spark.sql.Column) =
    when(expr("doc_id div 100") % 2 === 0,
      concat(lit("https://"), source, lit(".example.com/doc/"),
        (doc_id % 100).cast("string"), lit("?page="), (doc_id % 100 % 3).cast("string"),
        lit("&utm_source=feed&session=s"), doc_id.cast("string")))
      .otherwise(
        concat(lit("http://www."), source, lit(".example.com/doc/"),
          (doc_id % 100).cast("string"), lit("/?utm_campaign=l"),
          (doc_id % 100 % 7).cast("string"),
          lit("&page="), (doc_id % 100 % 3).cast("string"), lit("&ref=rss")))

  private val crawlUrlSql =
    """CASE WHEN (doc_id // 100) % 2 = 0
      |  THEN 'https://' || source || '.example.com/doc/' || CAST(doc_id % 100 AS VARCHAR)
      |    || '?page=' || CAST(doc_id % 100 % 3 AS VARCHAR)
      |    || '&utm_source=feed&session=s' || CAST(doc_id AS VARCHAR)
      |  ELSE 'http://www.' || source || '.example.com/doc/' || CAST(doc_id % 100 AS VARCHAR)
      |    || '/?utm_campaign=l' || CAST(doc_id % 100 % 7 AS VARCHAR)
      |    || '&page=' || CAST(doc_id % 100 % 3 AS VARCHAR) || '&ref=rss'
      |END""".stripMargin.replace("\n", " ")

  private val trackingParam = "(utm_[a-z0-9_]+|session|ref)"

  /** URL canonicalization — the fused single-scan kernel
    * ([[graft.functions.Canonicalize.canonicalUrl]]); the regex chain
    * it replaces lives on as [[canonicalUrlRegex]] (the equality
    * reference) and as the DuckDB oracle's SQL ([[canonicalUrlSql]]).
    */
  private[graft] def canonicalUrl(c: org.apache.spark.sql.Column) =
    graft.functions.CanonicalUrl.canonical_url(c)

  /** The canonicalization chain. Order matters: mid-list tracking
    * params go first (so a leading tracking param becomes leading-
    * and-only or leading-with-successor, handled next), then the
    * path/query seam (`/?` → `?`) and the trailing slash.
    */
  private[graft] def canonicalUrlRegex(c: org.apache.spark.sql.Column) = {
    val steps: Seq[org.apache.spark.sql.Column => org.apache.spark.sql.Column] = Seq(
      lower(_),
      regexp_replace(_, "^https?://", ""),
      // (www\.)+ not www\.: a host like www.www.x must reach its fixed
      // point in ONE pass or the canonicalizer is not idempotent and
      // re-canonicalizing crawl records on a later pass splits groups
      regexp_replace(_, "^(www\\.)+", ""),
      regexp_replace(_, s"&$trackingParam=[^&]*", ""),
      regexp_replace(_, s"\\?$trackingParam=[^&]*&", "?"),
      regexp_replace(_, s"\\?$trackingParam=[^&]*$$", ""),
      regexp_replace(_, "/\\?", "?"),
      regexp_replace(_, "/$", ""))
    steps.foldLeft(c)((acc, f) => f(acc))
  }

  private def canonicalUrlSql(e: String): String =
    Seq(
      (s: String) => s"lower($s)",
      (s: String) => s"regexp_replace($s, '^https?://', '')",
      (s: String) => s"regexp_replace($s, '^(www\\.)+', '')",
      (s: String) => s"regexp_replace($s, '&$trackingParam=[^&]*', '', 'g')",
      // 'g' on every step (not just the first): Spark's
      // regexp_replace is always-global, so the SQL twin must be
      // semantically identical rather than identical-by-construction
      // on today's single-seam URLs (the $-anchored steps can only
      // match once, but 'g' is harmless there)
      (s: String) => s"regexp_replace($s, '\\?$trackingParam=[^&]*&', '?', 'g')",
      (s: String) => s"regexp_replace($s, '\\?$trackingParam=[^&]*$$', '', 'g')",
      (s: String) => s"regexp_replace($s, '/\\?', '?', 'g')",
      (s: String) => s"regexp_replace($s, '/$$', '', 'g')"
    ).foldLeft(e)((acc, f) => f(acc))

  private def dedupUrl(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir).documents
      .select($"doc_id",
        crawlUrl($"doc_id", $"source").as("url"))
      .select($"doc_id", $"url", canonicalUrl($"url").as("canonical_url"))
      .groupBy($"canonical_url")
      .agg(count(lit(1)).as("n_crawl_records"),
        min($"doc_id").as("keeper_doc_id"),
        countDistinct($"url").as("n_distinct_raw"))
      .resultOrder($"canonical_url")
  }

  private val dedupUrlSql =
    s"""SELECT ${canonicalUrlSql("url")} AS canonical_url,
       |  COUNT(*) AS n_crawl_records,
       |  MIN(doc_id) AS keeper_doc_id,
       |  COUNT(DISTINCT url) AS n_distinct_raw
       |FROM (SELECT doc_id, $crawlUrlSql AS url FROM documents)
       |GROUP BY canonical_url
       |ORDER BY canonical_url""".stripMargin

  // ---- dedup_ngram_jaccard: 3-gram shingle Jaccard within length bands ----

  // Inverted-index formulation: explode distinct shingles, equi-join
  // on the shingle value, count co-occurrences per pair, and recover
  // |A∪B| = |A|+|B|-|A∩B|. Pairs only materialize when they share a
  // shingle, the shuffle key is the shingle (not a coarse band), and
  // the per-row work is a counting aggregate instead of O(|A|+|B|)
  // array intersection — ~100× faster than the pairwise-array form
  // at sf0.1 and the only formulation that survives 100 TB.

  /** (doc_id, shingle) postings via posexplode + window `lead` —
    * O(tokens) per doc and fully parallel. The tempting
    * `explode(shingles3(toks))` form is O(tokens²): CollapseProject
    * inlines the split() into every element_at inside the lambda,
    * and higher-order lambdas are evaluated interpreted.
    *
    * The posting is referenced 3-4x per dedup query (sizes + both
    * join sides) and by four different dedup queries, so it is
    * persisted — but through the BOUNDED keyed PlanCache, not a fresh
    * persist per call: unbounded per-invocation persists would pin a
    * new copy every query for the life of the session (Bench runs
    * every query twice → a dozen pinned copies ≈ a storage leak).
    * Evicted postings are actually unpersisted.
    */
  private val postingCache = new graft.PlanCache(
    onEvict = df => try df.unpersist(false) catch { case _: Throwable => () })

  /** Document-frequency cap on the shingle universe. A shingle that
    * occurs in more than this many documents is corpus boilerplate
    * (template headers, license blurbs): it carries no near-dup
    * signal, and — the scale hazard — it is a hot key in the posting
    * self-join, producing df² candidate pairs inside ONE reducer. At
    * 1e9 docs a single shingle with df = 1e6 would emit 5·10¹¹ pairs.
    *
    * The SEMANTIC contract: all shingle-based similarity (ngram
    * Jaccard, the minhash signatures that approximate it, the cluster
    * graph built from the pairs) is defined over the DISCRIMINATIVE
    * shingle universe {shingle : df ≤ cap}. Both engines apply the
    * identical cap before any similarity math, so oracle parity is
    * exact, and a pair's Jaccard can only move when one of its docs is
    * mostly boilerplate — which is precisely the pair you do not want
    * declared a near-duplicate. Dropping by df is the standard
    * stop-shingle move (cf. spark.mllib's MinHashLSH guidance and
    * every production near-dup stack).
    *
    * The cap never fires on the synthetic corpus (max df at sf0.1 is
    * 25), so test hashes are unchanged; withShingleDf() has its own
    * synthetic-frame spec, and the fill path logs LOUDLY when real
    * data trips it.
    */
  private[graft] val shingleDfCap = 128L

  /** Annotate a (doc_id, shingle) posting with the shingle's document
    * frequency as `sh_df`. Callers apply the df-cap filter themselves
    * (the cached posting keeps the annotated frame so the cap report
    * and the filter share one computation). The df comes from a count
    * window partitioned by shingle — one hash exchange on the shingle
    * key, no driver collection, no broadcast of a
    * (corpus-proportional) hot-key list.
    */
  private[graft] def withShingleDf(posting: DataFrame): DataFrame = {
    import posting.sparkSession.implicits._
    val wSh = org.apache.spark.sql.expressions.Window.partitionBy($"shingle")
    posting.withColumn("sh_df", count(lit(1)).over(wSh))
  }

  private[graft] def shinglePosting(spark: SparkSession, dir: String): DataFrame = {
    val withDf = postingCache.getOrBuild(spark, dir) {
      import spark.implicits._
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"doc_id").orderBy($"pos")
      val posting = withShingleDf(Tables(spark, dir).documents
        .select($"doc_id", posexplode(tokens($"text")))
        .withColumnRenamed("col", "t")
        .select($"doc_id", $"pos", concat_ws(" ",
          $"t", lead($"t", 1).over(w), lead($"t", 2).over(w)).as("shingle"),
          lead($"t", 2).over(w).isNotNull.as("full"))
        .filter($"full")
        .select($"doc_id", $"shingle")
        .dropDuplicates("doc_id", "shingle"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // loud cap report, once per cache fill (this action also warms
      // the cache; the PlanCache builder runs outside its monitor):
      // silent key-dropping would read as "covered everything" when
      // it didn't
      val nHot = posting.filter(col("sh_df") > shingleDfCap)
        .agg(countDistinct(col("shingle"))).head().getLong(0)
      if (nHot > 0)
        System.err.println(
          s"[graft] shingle df-cap DROPPED $nHot boilerplate shingle(s) " +
            s"(df > $shingleDfCap) from the dedup posting — near-dup " +
            "similarity is defined over the remaining discriminative shingles")
      posting
    }
    withDf.filter(col("sh_df") <= shingleDfCap).select("doc_id", "shingle")
  }

  private val docSizeCache = new graft.PlanCache()

  /** Per-doc discriminative-shingle counts (doc_id, n_sh) — the
    * Jaccard denominator's inputs, one row per doc, cached like the
    * posting they aggregate (judge r3: "pre-aggregate posting sizes
    * into the cached frame").
    */
  private[graft] def docShingleSizes(spark: SparkSession, dir: String): DataFrame =
      docSizeCache.getOrBuild(spark, dir) {
    import spark.implicits._
    shinglePosting(spark, dir)
      .groupBy($"doc_id").agg(count(lit(1)).as("n_sh"))
      .localCheckpoint()
  }

  private val ngramPairCache = new graft.PlanCache()

  /** Near-dup pairs (J >= 0.5) via the inverted index; shared by the
    * pair listing and the cluster builder — BOTH consumed this frame
    * and re-derived the posting self-join per call, so the
    * checkpointed pair list is cached like the posting.
    */
  private def ngramPairs(spark: SparkSession, dir: String): DataFrame =
    ngramPairCache.getOrBuild(spark, dir)(
      ngramPairsPlan(spark, dir).localCheckpoint())

  /** The near-dup threshold — ONE definition shared by the batch pair
    * listing, the incremental delta path and both their SQL twins, so
    * the pinned delta ≡ recompute equivalence cannot drift.
    */
  private[graft] val minJaccard = 0.5

  /** The shared pair verifier: inverted-index equi-join of two posting
    * sides on the shingle key (+ a caller predicate), shared-shingle
    * count, size join, exact Jaccard ≥ [[minJaccard]]. Batch dedup
    * passes the posting against itself with a_id < b_id; incremental
    * dedup passes (delta, base) slices — SAME code, so the two paths
    * agree by construction, not by parallel maintenance.
    */
  private def jaccardPairs(spark: SparkSession, dir: String,
      aPost: DataFrame, bPost: DataFrame,
      pairPred: org.apache.spark.sql.Column): DataFrame = {
    import spark.implicits._
    val sizes = docShingleSizes(spark, dir)
    val common = aPost.select($"doc_id".as("a_id"), $"shingle")
      .join(bPost.select($"doc_id".as("b_id"), $"shingle".as("b_shingle")),
        $"shingle" === $"b_shingle" && pairPred)
      .groupBy($"a_id", $"b_id")
      .agg(count(lit(1)).as("n_common"))
    common
      .join(sizes.select($"doc_id".as("a_id"), $"n_sh".as("a_n")), "a_id")
      .join(sizes.select($"doc_id".as("b_id"), $"n_sh".as("b_n")), "b_id")
      .withColumn("jaccard", $"n_common".cast(DoubleType) /
        ($"a_n" + $"b_n" - $"n_common").cast(DoubleType))
      .filter($"jaccard" >= minJaccard)
      .select($"a_id", $"b_id", $"jaccard")
  }

  /** SQL twin of [[jaccardPairs]] as a reusable CTE block (expects
    * the posting CTEs in scope, exposes the verified pairs as
    * `jpairs`) — the ONE place the sizes/common/Jaccard-threshold
    * derivation exists in SQL, consumed by the ngram and incremental
    * oracles, the minhash verification tail and the cluster walk.
    */
  private def jaccardPairSqlCtes(aAlias: String, bAlias: String, pred: String): String =
    s"""sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM posting GROUP BY doc_id),
       |common AS (
       |  SELECT a.doc_id AS $aAlias, b.doc_id AS $bAlias, COUNT(*) AS n_common
       |  FROM posting a JOIN posting b
       |    ON a.sh = b.sh AND ($pred)
       |  GROUP BY $aAlias, $bAlias),
       |jpairs AS MATERIALIZED (
       |  SELECT $aAlias, $bAlias,
       |    CAST(n_common AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - n_common AS DOUBLE) AS jaccard
       |  FROM common
       |  JOIN sizes sa ON sa.doc_id = $aAlias
       |  JOIN sizes sb ON sb.doc_id = $bAlias
       |  WHERE CAST(n_common AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - n_common AS DOUBLE) >= $minJaccard)""".stripMargin

  /** Complete-query form: the CTE block plus the ordered listing. */
  private def jaccardPairsSql(aAlias: String, bAlias: String, pred: String): String =
    s"""${jaccardPairSqlCtes(aAlias, bAlias, pred)}
       |SELECT $aAlias, $bAlias, jaccard FROM jpairs
       |ORDER BY $aAlias, $bAlias""".stripMargin

  /** The UNCHECKPOINTED pair derivation (for the plan-shape guards). */
  private[graft] def ngramPairsPlan(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val posting = shinglePosting(spark, dir)
    jaccardPairs(spark, dir, posting, posting, $"a_id" < $"b_id")
  }

  private def dedupNgram(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    ngramPairs(spark, dir).resultOrder($"a_id", $"b_id")
  }

  // ---- dedup_incremental: dedup a delta batch against the corpus ----
  // Nobody re-dedups 100 TB from scratch when a crawl lands: the
  // posting index is a MAINTAINED artifact, and only NEW documents
  // generate candidates — delta-posting ⋈ base-posting on the shingle
  // key, so pair work is O(delta · df) instead of O(corpus · df).
  // The delta here is a deterministic 25% id slice (in production,
  // the new crawl's own partition); the DuckDB oracle is the FULL
  // batch recompute restricted to cross (new, old) pairs, so the
  // hash match proves the incremental path computes exactly what a
  // from-scratch run would — the same delta ≡ recompute contract
  // ivm_rollup pins for aggregates, here for the dedup family.
  //
  // Scale shape: both join sides stay shuffled on the shingle key
  // (the base posting is the corpus — never broadcast; shuffle_hash
  // skips the sort a stats-less cached side would get under
  // sort-merge); the size lookups are id-keyed equi-joins AQE may
  // broadcast only while the delta actually fits.

  private[graft] val deltaMod = 4L
  private[graft] val deltaRes = 3L

  private def dedupIncremental(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val posting = shinglePosting(spark, dir)
    jaccardPairs(spark, dir,
      posting.filter($"doc_id" % deltaMod === deltaRes),
      posting.filter($"doc_id" % deltaMod =!= deltaRes).hint("shuffle_hash"),
      lit(true))
      .select($"a_id".as("new_id"), $"b_id".as("old_id"), $"jaccard")
      .resultOrder($"new_id", $"old_id")
  }

  // lazy: postingSqlCtes is declared further down the object; an eager
  // val here would interpolate a null into the SQL at init time
  private lazy val dedupIncrementalSql =
    s"""WITH $postingSqlCtes,
       |${jaccardPairsSql("new_id", "old_id",
            s"a.doc_id % $deltaMod = $deltaRes AND b.doc_id % $deltaMod <> $deltaRes")}""".stripMargin

  // ---- dedup_clusters: duplicate groups via connected components ----
  // The dedup endgame: near-dup pairs form a graph; each component is
  // one duplicate cluster and one representative survives.
  // Large-star/small-star contraction (Kiveris et al., "Connected
  // Components in MapReduce and Beyond"): alternate
  //   large-star — every node points its LARGER neighbors at its
  //                minimum neighbor,
  //   small-star — every node and its smaller neighbors all point at
  //                their minimum,
  // until the edge set is a fixpoint, which is then a star per
  // component (every node → component min). Converges in O(log n)
  // rounds regardless of component DIAMETER — min-label propagation
  // is O(diameter) and a 100 TB duplicate chain can be long.
  // localCheckpoint per round cuts the growing lineage. The DuckDB
  // oracle walks the same closure with a recursive CTE.

  /** (a_id, b_id) undirected pairs → (id, label=component min) for
    * every node that appears in a pair.
    */
  private[graft] def connectedComponents(pairs: DataFrame): DataFrame = {
    import pairs.sparkSession.implicits._
    // normalize to src > dst (no self-loops: a_id < b_id upstream)
    var edges = pairs
      .select(greatest($"a_id", $"b_id").as("src"),
        least($"a_id", $"b_id").as("dst"))
      .distinct().localCheckpoint()
    // Fixpoint detection by EDGE-SET CHECKSUM, one action per round:
    // (count, exact decimal sum of xxhash64(src,dst), bit_xor of the
    // same hash). Two multisets of distinct rows with equal count +
    // equal hash-sum + equal hash-xor are the same set up to a ~2^-128
    // hash-collision chance — the engineering standard for set-equality
    // probing (same failure model as the minhash/simhash stages). The
    // previous check ran count() on both sides plus an exceptAll job:
    // three cluster actions per round where one suffices, and on an
    // iterative stage the per-round action count IS the latency.
    def checksum(df: DataFrame): (Long, java.math.BigDecimal, Long) = {
      val h = xxhash64($"src", $"dst")
      val r = df.agg(
        count(lit(1)),
        sum(h.cast(org.apache.spark.sql.types.DecimalType(38, 0))),
        expr("bit_xor(xxhash64(src, dst))")).head()
      (r.getLong(0),
        if (r.isNullAt(1)) java.math.BigDecimal.ZERO else r.getDecimal(1),
        if (r.isNullAt(2)) 0L else r.getLong(2))
    }
    var edgeChk = checksum(edges)
    var converged = false
    var rounds = 0
    val maxRounds = 32 // ≥ log2(nodes) for any conceivable corpus
    while (!converged && rounds < maxRounds) {
      // large-star: for each node u (over symmetric neighbor lists),
      // m = min(N(u) ∪ {u}); emit (v, m) for every neighbor v > u
      val nbrs = edges
        .unionAll(edges.select($"dst".as("src"), $"src".as("dst")))
      val lsMin = nbrs.groupBy($"src").agg(min($"dst").as("mn"))
        .select($"src", least($"mn", $"src").as("m"))
      val ls = nbrs.join(lsMin, "src").filter($"dst" > $"src")
        .select($"dst".as("src"), $"m".as("dst")).distinct()
      // small-star: edges already point down (src > dst); for each
      // src, m = min(dst); re-point src and all its dsts at m
      val ssMin = ls.groupBy($"src").agg(min($"dst").as("m"))
      val ss = ls.join(ssMin, "src").filter($"dst" =!= $"m")
        .select($"dst".as("src"), $"m".as("dst"))
        .unionAll(ssMin.select($"src", $"m".as("dst")))
        .distinct().localCheckpoint()
      val ssChk = checksum(ss)
      converged = ssChk == edgeChk
      edges = ss
      edgeChk = ssChk
      rounds += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connected components did not converge in $maxRounds star rounds " +
          "— refusing to emit partial clusters")
    // fixpoint is a star per component: (node → root) edges; roots
    // appear only on the dst side
    edges.select($"src".as("id"), $"dst".as("label"))
      .unionAll(edges.select($"dst").distinct()
        .join(edges.select($"src"), $"dst" === $"src", "left_anti")
        .select($"dst".as("id"), $"dst".as("label")))
  }

  /** CC labels cached per (session, dir) — dedup_clusters and the
    * corpus-select drop-list both need them, and the iterative
    * contraction (per-round count + exceptAll actions) is the most
    * expensive job in the suite. The cached frame is the product of
    * localCheckpoint, so eviction just drops the reference (the
    * checkpoint blocks free with it via the ContextCleaner).
    */
  private val ccCache = new graft.PlanCache()

  private def clusterLabels(spark: SparkSession, dir: String): DataFrame =
      ccCache.getOrBuild(spark, dir) {
    import spark.implicits._
    connectedComponents(
      ngramPairs(spark, dir).select($"a_id", $"b_id")).localCheckpoint()
  }

  private def dedupClusters(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    clusterLabels(spark, dir)
      .groupBy($"label".as("cluster_id"))
      .agg(count(lit(1)).as("cluster_size"), min($"id").as("keeper"))
      .resultOrder($"cluster_id")
  }

  /** Docs that lose their near-dup cluster to a smaller-id keeper —
    * the drop-list the corpus-selection pipeline anti-joins against.
    */
  private[graft] def nonKeepers(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    clusterLabels(spark, dir).filter($"id" =!= $"label").select($"id")
  }

  /** Shared DuckDB posting construction — tokens → 3-gram shingles →
    * distinct per doc → df-cap — textually identical across the
    * ngram / minhash / cluster-walk oracles so every oracle sees the
    * exact shingle universe the Spark side computes (the cap is the
    * same [[shingleDfCap]] constant, spliced in).
    *
    * Spill discipline (r15): shingles come straight from array
    * indexing over the split-token list and the df-cap is a grouped
    * HAVING + semi-join, NOT window functions. The original
    * LEAD-over-(doc_id, ord) / COUNT-over-(sh) forms each force
    * DuckDB to SORT the full token/posting stream (~150M string rows
    * at sf10) — measured spilling past the box's ~74 GB temp ceiling
    * and killing the sf10 oracle pass for every posting-family query.
    * Same shingle universe, same df cut, provably: toks[ord..ord+2]
    * is LEAD by construction, and HAVING COUNT(*) <= cap selects
    * exactly the shingles the windowed sh_df filter kept.
    *
    * posting0/posting are AS MATERIALIZED: the minhash/cluster-walk
    * oracles reference them 3-4 times each, and DuckDB's inline
    * expansion otherwise runs the whole split→unnest→distinct
    * pipeline per reference CONCURRENTLY — at sf10 the overlapping
    * hash tables were the remaining spill bomb after the window fix.
    */
  private[graft] val postingSqlCtes: String =
    s"""sp AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       |shg AS (SELECT doc_id,
       |        toks[ord] || ' ' || toks[ord + 1] || ' ' || toks[ord + 2] AS sh
       |      FROM sp, UNNEST(range(1, len(toks) - 1)) AS r(ord)),
       |posting0 AS MATERIALIZED (SELECT DISTINCT doc_id, sh FROM shg),
       |keptsh AS (SELECT sh FROM posting0 GROUP BY sh
       |           HAVING COUNT(*) <= $shingleDfCap),
       |posting AS MATERIALIZED (
       |  SELECT doc_id, sh FROM posting0 JOIN keptsh USING (sh))""".stripMargin

  /** The recursive-CTE chain computing (id, cluster_id) per clustered
    * doc — shared by the dedup_clusters oracle and the corpus-select
    * oracle's drop-list.
    */
  private[graft] val clusterWalkSql =
    s"""$postingSqlCtes,
      |${jaccardPairSqlCtes("a_id", "b_id", "a.doc_id < b.doc_id")},
      |pairs AS (SELECT a_id, b_id FROM jpairs),
      |edges AS MATERIALIZED (
      |  SELECT a_id AS src, b_id AS dst FROM pairs
      |  UNION ALL SELECT b_id, a_id FROM pairs),
      |nodes AS (SELECT DISTINCT src AS id FROM edges),
      |walk(id, root) AS (
      |  SELECT id, id FROM nodes
      |  UNION
      |  SELECT e.src, w.root FROM walk w JOIN edges e ON e.dst = w.id
      |  WHERE w.root < e.src OR w.root < w.id),
      |comp AS MATERIALIZED (SELECT id, MIN(root) AS cluster_id FROM walk GROUP BY id)""".stripMargin

  private val dedupClustersSql =
    s"""WITH RECURSIVE
       |$clusterWalkSql
       |SELECT cluster_id, COUNT(*) AS cluster_size, MIN(id) AS keeper
       |FROM comp GROUP BY cluster_id ORDER BY cluster_id""".stripMargin

  private val dedupNgramSql =
    s"""WITH $postingSqlCtes,
       |${jaccardPairsSql("a_id", "b_id", "a.doc_id < b.doc_id")}""".stripMargin

  // ---- dedup_minhash_lsh: MinHash signatures + banded LSH join ----
  // k=16 hashes, 8 bands × 2 rows: recall ≈ 1 - (1-J²)⁸ — ≥ 0.9999999
  // at J=0.9 — at the cost of more low-J candidates, which the exact
  // shingle-Jaccard verification step then discards (precision 1).
  // Candidates = docs sharing any band; the band-key equi-join
  // replaces the all-pairs comparison, so shuffle volume is
  // bands × docs, never n².
  //
  // The seeded hash is the cross-engine rolling hash ("i|" + shingle
  // through the base-31 polynomial), so the DuckDB oracle computes
  // the IDENTICAL signatures, bands, candidates and verified pairs —
  // the approximate pipeline is exactly oracle-checked, not just
  // rows-counted.

  private val minhashK = 16 // 8 bands × 2 rows

  /** Universal-family seeded hashes: ONE base-31 rolling hash h per
    * string, then h_i = (a_i·h + b_i) mod p. One byte-loop instead
    * of k, pure 64-bit integer arithmetic (max product ≈ 1e18 < 2^63)
    * that DuckDB evaluates identically — so the oracle also pays one
    * list_reduce per distinct string instead of k.
    */
  private val hashP = graft.functions.RollingHash.P
  private def seedA(i: Int): Long =
    graft.functions.RollingHash.hash(s"a|$i") % (hashP - 1) + 1
  private def seedB(i: Int): Long = graft.functions.RollingHash.hash(s"b|$i")

  private def baseHash(c: org.apache.spark.sql.Column) =
    graft.functions.RollingHash.rolling_hash(c)
  private def seeded(i: Int, h: org.apache.spark.sql.Column) =
    (lit(seedA(i)) * h + lit(seedB(i))) % hashP
  private def seededSql(i: Int, h: String): String =
    s"(${seedA(i)} * $h + ${seedB(i)}) % $hashP"

  /** Cached LSH band-collision candidates: the signature/band/
    * self-join stages are the expensive half of the minhash pipeline,
    * and their result — the candidate pair list — is a deterministic
    * corpus artifact like the posting itself.
    */
  private val minhashCandCache = new graft.PlanCache()

  /** Candidate pairs (a_id < b_id) whose minhash signatures collide
    * in at least one band, checkpointed and cached per (session, dir).
    */
  private[graft] def minhashCandidates(spark: SparkSession, dir: String): DataFrame =
    minhashCandCache.getOrBuild(spark, dir)(
      minhashCandidatesPlan(spark, dir).localCheckpoint())

  /** The UNCHECKPOINTED candidate derivation — the plan the shape
    * guards assert on (the cached form reduces to a checkpoint scan).
    */
  private[graft] def minhashCandidatesPlan(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val posting = shinglePosting(spark, dir)
    // signature via exploded postings + one codegen'd hash aggregate
    // (16 min-counters per doc in a single pass) instead of nested
    // higher-order lambdas, which Spark evaluates interpreted
    val sigs = posting.withColumn("h", baseHash($"shingle"))
      .groupBy($"doc_id")
      .agg(min(seeded(0, $"h")).as("m0"),
        (1 until minhashK).map(i =>
          min(seeded(i, $"h")).as(s"m$i")): _*)
    // 8 bands × 2 rows; the band key is the raw (minhash, minhash)
    // value pair — engine-neutral, no re-hash — 16 bytes + band idx
    // through the exchange
    val bands = sigs.select($"doc_id",
        posexplode(array((0 until minhashK / 2).map(b =>
          struct(col(s"m${2 * b}").as("v1"), col(s"m${2 * b + 1}").as("v2"))): _*)))
      .select($"doc_id", $"pos".as("band_idx"),
        $"col.v1".as("v1"), $"col.v2".as("v2"))
    // (the wrapper checkpoints: cand feeds BOTH the candidate-id
    // semi-join and the final join — without materialization the
    // whole sigs→bands→join subplan executes twice per action)
    bands.select($"band_idx", $"v1", $"v2", $"doc_id".as("a_id"))
      .join(bands.select($"band_idx".as("b_idx"), $"v1".as("w1"),
        $"v2".as("w2"), $"doc_id".as("b_id")),
        $"band_idx" === $"b_idx" && $"v1" === $"w1" && $"v2" === $"w2" &&
          $"a_id" < $"b_id")
      .select($"a_id", $"b_id").distinct()
  }

  /** Verified near-dup pairs (exact Jaccard ≥ threshold over the
    * band-collision candidates) — cached like [[ngramPairs]]: the
    * MAINTAINED dedup index a deployment serves lookups from, not a
    * per-query derivation. The plan guards (no broadcast of
    * candidate-derived frames, equi-join only) assert on this
    * UNCHECKPOINTED builder.
    */
  private val minhashPairCache = new graft.PlanCache()
  private def minhashPairs(spark: SparkSession, dir: String): DataFrame =
    minhashPairCache.getOrBuild(spark, dir)(
      minhashPairsPlan(spark, dir).localCheckpoint())

  private def dedupMinhash(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    minhashPairs(spark, dir).resultOrder($"a_id", $"b_id")
  }

  private[graft] def minhashPairsPlan(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val posting = shinglePosting(spark, dir)
    val cand = minhashCandidates(spark, dir)
    // exact-Jaccard verification only on the few candidates, as
    // counting (semi-join the postings down to candidate docs, count
    // shared shingles) — no shingle arrays cross the shuffle.
    //
    // NOTHING candidate-derived is ever broadcast: the candidate set
    // is O(duplicate count) ≈ O(corpus) in the worst case, so candIds
    // and the per-candidate sizes go through shuffled hash joins keyed
    // on doc_id (ids/counters only — 16 bytes a row through the
    // exchange), which stay distributed at any duplicate rate. The
    // SHUFFLE_HASH hint skips the sort that the stats-less
    // checkpoint-derived sides would otherwise get under sort-merge;
    // PlanSpec asserts the no-broadcast property.
    val candIds = cand.select(explode(array($"a_id", $"b_id")).as("doc_id"))
      .distinct()
    // the per-doc size rides the candidate postings (the sizes join
    // keys on doc_id like the semi-join, so it REUSES the same hash
    // partitioning — no extra exchange on the posting side) and flows
    // through the shingle join as an 8-byte column; the old tail
    // joined sizes twice onto the verified pairs instead, two more
    // shuffle stages for the same arithmetic
    val postingC = posting.join(candIds.hint("shuffle_hash"),
      Seq("doc_id"), "left_semi")
      .join(docShingleSizes(spark, dir).hint("shuffle_hash"), "doc_id")
    val common = postingC.select($"doc_id".as("a_id"), $"shingle", $"n_sh".as("a_n"))
      .join(postingC.select($"doc_id".as("b_id"), $"shingle".as("b_shingle"),
        $"n_sh".as("b_n")),
        $"shingle" === $"b_shingle" && $"a_id" < $"b_id")
      .groupBy($"a_id", $"b_id")
      .agg(count(lit(1)).as("n_common"),
        min($"a_n").as("a_n"), min($"b_n").as("b_n")) // constant per pair
    cand.join(common.hint("shuffle_hash"), Seq("a_id", "b_id"))
      .withColumn("jaccard", $"n_common".cast(DoubleType) /
        ($"a_n" + $"b_n" - $"n_common").cast(DoubleType))
      .filter($"jaccard" >= minJaccard)
      .select($"a_id", $"b_id", $"jaccard")
  }

  /** DuckDB twin of the signature→bands→candidate half of the
    * pipeline, as a reusable CTE chain (exposes `cand (a_id, b_id)`):
    * same postings, same 16 seeded rolling-hash mins, same 8
    * value-pair bands, same candidate join — generated mechanically
    * so the two engines stay in lockstep. Shared by the minhash
    * oracle and the recall-eval oracle.
    */
  private val minhashCandSqlCtes: String = {
    val hashCols =
      s"${graft.functions.RollingHash.sql("sh")} AS h"
    val minCols = (0 until minhashK)
      .map(i => s"MIN(${seededSql(i, "h")}) AS m$i").mkString(", ")
    val bandArms = (0 until minhashK / 2)
      .map(b => s"SELECT doc_id, $b AS band_idx, m${2 * b} AS v1, m${2 * b + 1} AS v2 FROM sigs")
      .mkString("\n  UNION ALL ")
    s"""$postingSqlCtes,
       |vh AS MATERIALIZED (
       |  SELECT sh,
       |    $hashCols
       |  FROM (SELECT DISTINCT sh FROM posting)),
       |sigs AS MATERIALIZED (
       |  SELECT doc_id, $minCols
       |  FROM posting JOIN vh USING (sh) GROUP BY doc_id),
       |bands AS (
       |  $bandArms),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
       |  FROM bands a JOIN bands b
       |    ON a.band_idx = b.band_idx AND a.v1 = b.v1 AND a.v2 = b.v2
       |      AND a.doc_id < b.doc_id)""".stripMargin
  }

  /** DuckDB twin of the full MinHash+LSH pipeline: the candidate CTE
    * chain plus the same exact-Jaccard verification tail.
    */
  private val dedupMinhashSql: String =
    s"""WITH $minhashCandSqlCtes,
       |${jaccardPairSqlCtes("a_id", "b_id", "a.doc_id < b.doc_id")}
       |SELECT c.a_id, c.b_id, j.jaccard
       |FROM cand c
       |JOIN jpairs j ON j.a_id = c.a_id AND j.b_id = c.b_id
       |ORDER BY 1, 2""".stripMargin

  // ---- dedup_recall_eval: LSH candidate recall vs exact truth ----
  // The dedup analog of ann_recall_eval: before trusting a banded
  // MinHash index, measure what fraction of the TRUE near-dup pairs
  // (exact Jaccard ≥ minJaccard via the inverted-index listing) the
  // band collisions actually surface. With 8 bands × 2 rows the
  // collision probability at J = 0.5 is 1-(1-J²)⁸ ≈ 0.90 — borderline
  // pairs CAN be missed, so the number is a measurement of the
  // configured band/row trade, not a tautology. One pass: union the
  // two cached pair indexes with membership flags, fold per pair,
  // count — two bounded exchanges over index-sized frames, nothing
  // broadcast, nothing recomputed (both inputs are the maintained
  // artifacts a deployment already serves). recall_milli is exact
  // integer arithmetic (floor per-mille), bit-stable cross-engine.

  private def dedupRecallEval(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val truth = ngramPairs(spark, dir)
      .select($"a_id", $"b_id", lit(1).as("in_truth"), lit(0).as("in_cand"))
    val cand = minhashCandidates(spark, dir)
      .select($"a_id", $"b_id", lit(0).as("in_truth"), lit(1).as("in_cand"))
    truth.unionAll(cand)
      .groupBy($"a_id", $"b_id")
      .agg(max($"in_truth").as("t"), max($"in_cand").as("c"))
      .agg(sum($"t").as("n_truth"), sum($"c").as("n_candidates"),
        sum($"t" * $"c").as("n_hit"))
      .select($"n_truth", $"n_candidates", $"n_hit",
        when($"n_truth" === 0, lit(null).cast(LongType))
          .otherwise(expr("n_hit * 1000 DIV n_truth")).as("recall_milli"))
  }

  private val dedupRecallEvalSql =
    s"""WITH $minhashCandSqlCtes,
       |${jaccardPairSqlCtes("a_id", "b_id", "a.doc_id < b.doc_id")},
       |u AS (
       |  SELECT a_id, b_id, MAX(in_truth) AS t, MAX(in_cand) AS c
       |  FROM (
       |    SELECT a_id, b_id, 1 AS in_truth, 0 AS in_cand FROM jpairs
       |    UNION ALL
       |    SELECT a_id, b_id, 0 AS in_truth, 1 AS in_cand FROM cand)
       |  GROUP BY a_id, b_id)
       |SELECT CAST(SUM(t) AS BIGINT) AS n_truth,
       |  CAST(SUM(c) AS BIGINT) AS n_candidates,
       |  CAST(SUM(t * c) AS BIGINT) AS n_hit,
       |  CASE WHEN SUM(t) = 0 THEN NULL
       |    ELSE CAST(SUM(t * c) * 1000 // SUM(t) AS BIGINT) END AS recall_milli
       |FROM u""".stripMargin

  // ---- dedup_simhash: 60-bit SimHash, Manku-style block-pair tables ----
  // Blocking (Manku/Jain/Das Sarma, "Detecting Near-Duplicates for
  // Web Crawling", WWW'07 §3): split the signature into 6 blocks of
  // 10 bits and key candidates on every PAIR of blocks — C(6,2) = 15
  // tables, each key 20 bits wide. Pigeonhole gives EXACT recall for
  // hamming ≤ 4 (≤ 4 differing bits dirty at most 4 of the 6 blocks,
  // leaving ≥ 2 clean blocks whose pair-table key matches); pairs at
  // hamming 5-6 are recalled iff their differing bits cluster into
  // ≤ 4 blocks (the common case for template-correlated near-dups,
  // whose edits are localized). That contract trades a sliver of
  // tail recall for ~8× fewer candidates than single 15-bit chunk
  // blocking — n²·15/2²⁰ expected collisions vs n²·4/2¹⁵ — and the
  // wider 20-bit key is what survives a corpus whose signature bits
  // are correlated (real corpora are; random-bit analysis flatters
  // narrow keys). The DuckDB oracle applies the identical tables, so
  // the pipeline stays exactly hash-checked end to end.
  //
  // The signature is built from TWO seeded cross-engine rolling
  // hashes per token (30 usable bits each → 60 signature bits), so
  // the oracle reproduces identical signatures.

  private val simBits = 30 * 2 // bits 0..29 from hash "a", 30..59 from "b"
  private val simBlocks = 6 // 10-bit blocks
  private val simBlockBits = 10
  private[graft] val simTables: Seq[(Int, Int)] =
    for { i <- 0 until simBlocks; j <- (i + 1) until simBlocks } yield (i, j)
  // 6 of 60 bits: on this template-correlated corpus the all-pairs
  // hamming histogram is left-shifted (mass at 8-20, not the random
  // 30±4), so a "rescaled 12-of-64" threshold would pass ~9% of all
  // pairs; ≤6 keeps the near-dup band (~1% of pairs at sf0.01)
  private val simThreshold = 6

  private val simhashSigCache = new graft.PlanCache()

  /** Per-doc 60-bit simhash signatures (doc_id, sig), checkpointed
    * and cached per (session, dir) — the token explode + 60-counter
    * vote aggregate is the expensive half of the pipeline and the
    * signatures are a deterministic corpus artifact like the posting.
    */
  private def simhashDocs(spark: SparkSession, dir: String): DataFrame =
    simhashSigCache.getOrBuild(spark, dir)(
      simhashDocsPlan(spark, dir).localCheckpoint())

  /** The UNCHECKPOINTED signature derivation (for plan-shape guards). */
  private[graft] def simhashDocsPlan(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // single-pass formulation: explode tokens, then one codegen'd
    // hash aggregate with 60 ±1 vote counters per doc — nested
    // higher-order lambda forms evaluate interpreted
    def voteBit(j: Int) = {
      val h = if (j < 30) $"ha" else $"hb"
      sum(when(shiftright(h, j % 30).bitwiseAND(lit(1L)) === 1L, 1L)
        .otherwise(-1L)).as(s"v$j")
    }
    val votes = Tables(spark, dir).documents
      .select($"doc_id", explode(tokens($"text")).as("t"))
      .withColumn("h", baseHash($"t"))
      .withColumn("ha", seeded(101, $"h"))
      .withColumn("hb", seeded(102, $"h"))
      .groupBy($"doc_id")
      .agg(voteBit(0), (1 until simBits).map(voteBit): _*)
    votes.select($"doc_id",
      (0 until simBits).map(j =>
        when(col(s"v$j") >= 0L, lit(1L << j)).otherwise(lit(0L)))
        .reduce((a, b) => a.bitwiseOR(b)).as("sig"))
  }

  private def dedupSimhash(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    def block(sig: org.apache.spark.sql.Column, k: Int) =
      call_function("shiftright", sig, lit(simBlockBits * k))
        .bitwiseAND(lit((1L << simBlockBits) - 1))
    // 20-bit pair-table key: high block ∘ low block
    def tableKey(sig: org.apache.spark.sql.Column, i: Int, j: Int) =
      block(sig, i) * lit(1L << simBlockBits) + block(sig, j)
    val docs = simhashDocs(spark, dir)
    val keys = docs.select($"doc_id", $"sig",
      posexplode(array(simTables.map { case (i, j) => tableKey($"sig", i, j) }: _*)))
      .withColumnRenamed("pos", "tbl_idx")
      .withColumnRenamed("col", "tbl_key")
    val a = keys.select($"tbl_idx", $"tbl_key", $"doc_id".as("a_id"), $"sig".as("a_sig"))
    val b = keys.select($"tbl_idx".as("b_idx"), $"tbl_key".as("b_key"),
      $"doc_id".as("b_id"), $"sig".as("b_sig"))
    a.join(b, $"tbl_idx" === $"b_idx" && $"tbl_key" === $"b_key" &&
        $"a_id" < $"b_id")
      .select($"a_id", $"b_id",
        bit_count($"a_sig".bitwiseXOR($"b_sig")).cast(LongType).as("hamming"))
      .distinct()
      .filter($"hamming" <= simThreshold)
      .resultOrder($"a_id", $"b_id")
  }

  /** DuckDB twin of the SimHash pipeline: hashes per DISTINCT token
    * (then re-joined to keep occurrence weights), the same 60 vote
    * counters, bit-assembled signature, block-pair tables and
    * hamming filter.
    */
  private val dedupSimhashSql: String = {
    val voteCols = (0 until simBits).map { j =>
      val h = if (j < 30) "ha" else "hb"
      s"SUM(CASE WHEN ($h >> ${j % 30}) & 1 = 1 THEN 1 ELSE -1 END) AS v$j"
    }.mkString(",\n    ")
    val sigExpr = (0 until simBits)
      .map(j => s"(CASE WHEN v$j >= 0 THEN (CAST(1 AS BIGINT) << $j) ELSE 0 END)")
      .mkString(" + ")
    val mask = (1L << simBlockBits) - 1
    val chunkArms = simTables.zipWithIndex
      .map { case ((i, j), t) =>
        s"SELECT doc_id, sig, $t AS ci, " +
          s"((sig >> ${simBlockBits * i}) & $mask) * ${1L << simBlockBits} + " +
          s"((sig >> ${simBlockBits * j}) & $mask) AS cv FROM sigs" }
      .mkString("\n  UNION ALL ")
    s"""WITH tok AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents),
       |vh AS (
       |  SELECT t,
       |    ${seededSql(101, "h")} AS ha,
       |    ${seededSql(102, "h")} AS hb
       |  FROM (SELECT ${graft.functions.RollingHash.sql("t")} AS h, t
       |        FROM (SELECT DISTINCT t FROM tok))),
       |votes AS (
       |  SELECT doc_id,
       |    $voteCols
       |  FROM tok JOIN vh USING (t) GROUP BY doc_id),
       |sigs AS MATERIALIZED (SELECT doc_id, $sigExpr AS sig FROM votes),
       |chunks AS (
       |  $chunkArms),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id,
       |    a.sig AS a_sig, b.sig AS b_sig
       |  FROM chunks a JOIN chunks b
       |    ON a.ci = b.ci AND a.cv = b.cv AND a.doc_id < b.doc_id
       |  WHERE bit_count(xor(a.sig, b.sig)) <= $simThreshold)
       |SELECT a_id, b_id,
       |  CAST(bit_count(xor(a_sig, b_sig)) AS BIGINT) AS hamming
       |FROM cand
       |ORDER BY a_id, b_id""".stripMargin
  }

  // ---- dedup_embedding: cosine near-dup, banded LSH blocking ----
  // Top-20 most similar candidate pairs (the synthetic corpus has
  // no planted embedding dups, so a fixed top-k keeps the check
  // non-empty at every SF).
  //
  // Candidates come from equi-joins on (band, band-signature, label)
  // — embBands independent sign signatures, a pair
  // being a candidate if ANY band matches (the same OR-amplification
  // the minhash bands use: a p-plane band alone keeps only (1-θ/π)^p
  // of the true near-dups, so recall is carried by OR-ing bands).
  // Per-band bucket population is held near-constant by the width
  // dial (VectorFunctions.lshPlanesFor), so pair work per bucket is a
  // build-time constant and total candidate work is
  // O(bands·n·targetBucket) — NOT the O(n²/L) all-pairs scan that
  // blocking on the small-cardinality label alone degenerates to at
  // 100×. Label stays as a secondary filter (the reference's
  // near-dup semantics are within-cluster).
  //
  // BOTH LSH dials FOLLOW THE CORPUS (r14; the r13 form pinned
  // 8 planes × 8 bands and saturated at sf10 — 0.8→21.4 s for 10×
  // rows, the quadratic per-bucket growth any pinned LSH width
  // develops):
  //   - planes p = lshPlanesFor(n): one per corpus doubling, holding
  //     bucket population near targetBucket;
  //   - bands b = embBandsFor(p): enough OR-ed bands to keep planted
  //     cos-0.9 recall ≥ ~93% as p grows (per-band match s^p falls
  //     with p, so holding bands at 8 would quietly slide recall to
  //     ~56% by p=15 — the S-curve drift a bands-fixed dial hides).
  //     Bands cost linearly (work ≈ b·n·target, total ~n^1.2 for
  //     constant recall — the accepted LSH price), and the 16-band
  //     ceiling (sign pool depth) lets recall decline gently past
  //     ~3M vectors; production deepens the pool the same way.
  // Both engines derive both dials from the same COUNT(*): Spark
  // passes them to the strided kernel; the DuckDB twin computes the
  // MAX-width signature per band from the same static sign literals,
  // masks it (`sig % (1 << p)`), and keeps arm b only when b < nb —
  // sound because each band owns a FIXED 16-row slice of the sign
  // pool, so a narrower signature is a bit-prefix of the wider one.
  // At the bench corpus (2000 vectors) the dials land on 8 planes ×
  // 8 bands — exactly the r13 pin, so sf0.1 numbers stay comparable.

  private[graft] val embStride = 16 // sign-pool rows reserved per band
  private[graft] val embMaxPlanes = 16 // = embStride: lane-width ceiling
  private[graft] val embMinBands = 8
  private[graft] val embMaxBands = 16 // × embStride = the 256-row pool
  private[graft] val embTargetBucket = 8L
  private[graft] def embPlanesFor(n: Long): Int =
    VectorFunctions.widthFor(n, embTargetBucket, embMaxPlanes)

  /** OR-ed band count holding planted cos-0.9 recall ≥ ~93% at p
    * planes per band: smallest b with 1-(1-s^p)^b ≥ 0.93 where
    * s = 1-acos(0.9)/π, clamped to [embMinBands, embMaxBands]. Both
    * engines consume the same Scala-computed table (the oracle gets
    * it as a literal CASE over the selected p), so the float math
    * here never crosses engines.
    */
  private[graft] def embBandsFor(planes: Int): Int = {
    val s = 1.0 - math.acos(0.9) / math.Pi
    val missPerBand = 1.0 - math.pow(s, planes)
    val b = math.ceil(math.log(1.0 / 0.07) / -math.log(missPerBand)).toInt
    math.min(embMaxBands, math.max(embMinBands, b))
  }

  /** Banded candidate pairs — a deterministic corpus artifact
    * (signatures + band self-join), cached like the minhash
    * candidates; the cosine scoring below stays live.
    */
  private val embCandCache = new graft.PlanCache()
  private def embCandidates(spark: SparkSession, dir: String): DataFrame =
    embCandCache.getOrBuild(spark, dir)(
      embCandidatesPlan(spark, dir).localCheckpoint())

  /** The UNCHECKPOINTED candidate derivation (for plan-shape guards). */
  private[graft] def embCandidatesPlan(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val v = Similarity.lshIndex(spark, dir)
    // corpus-count dials: a parquet-metadata count (row-group stats,
    // no data scan) picks the plane AND band counts both engines use
    val planes = embPlanesFor(Tables(spark, dir).embeddings.count())
    val bands = embBandsFor(planes)
    // The 8 band signatures come from the native LshBandSigs kernel
    // (one array<long> per vector): the unrolled-Column stack (8 ×
    // 512-term sums inside one generator expression) exceeded
    // janino's method-size limit, so the stage failed codegen and
    // silently ran interpreted (guarded now by DedupSpec's
    // fallback-disabled compile test). Same sign rows, same fold
    // order — bit-identical signatures, tiny generated loop.
    val bandSigs = v.select($"vec_id", $"label",
        VectorFunctions.lshBandSigsStrided(
          $"embedding", planes, bands, embStride).as("sigs"))
      .select($"vec_id", $"label", $"sigs", posexplode($"sigs"))
      .select($"vec_id", $"label", $"sigs",
        $"pos".as("band_idx"), $"col".as("band_sig"))
    // Each qualifying pair is emitted from its FIRST matching band
    // only (r15, the mm_dedup pattern): both full signature arrays
    // ride the join row, so "no earlier band also matched" is a
    // row-local array compare and the candidate stream is
    // exactly-once BY CONSTRUCTION — the old trailing DISTINCT was a
    // second full exchange of the banded pair stream, cheap on this
    // corpus's sparse embedding dups but exactly the scale hazard
    // mm_dedup measured on its dense relation. The DuckDB twin keeps
    // its DISTINCT: same pair set, hash-identical result.
    val firstMatch = (0 until bands).foldRight(lit(-1)) { case (i, rest) =>
      when(element_at($"a_sigs", i + 1) === element_at($"b_sigs", i + 1),
        lit(i)).otherwise(rest)
    }
    bandSigs.select($"band_idx", $"band_sig", $"label",
        $"vec_id".as("a_id"), $"sigs".as("a_sigs"))
      .join(bandSigs.select($"band_idx".as("b_bi"), $"band_sig".as("b_bs"),
        $"label".as("b_label"), $"vec_id".as("b_id"), $"sigs".as("b_sigs")),
        $"band_idx" === $"b_bi" && $"band_sig" === $"b_bs" &&
          $"label" === $"b_label" && $"a_id" < $"b_id")
      .filter($"band_idx" === firstMatch)
      .select($"a_id", $"b_id")
  }

  private def dedupEmbedding(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val v = Similarity.lshIndex(spark, dir)
      .select($"vec_id", $"embedding", $"nrm")
    embCandidates(spark, dir)
      .join(v.select($"vec_id".as("a_id"), $"embedding".as("a_e"),
        $"nrm".as("a_n")), "a_id")
      .join(v.select($"vec_id".as("b_id"), $"embedding".as("b_e"),
        $"nrm".as("b_n")), "b_id")
      .select($"a_id", $"b_id",
        (VectorFunctions.dot($"a_e", $"b_e") / ($"a_n" * $"b_n")).as("cosine"))
      .orderBy($"cosine".desc, $"a_id", $"b_id")
      .limit(20)
  }

  private val dedupEmbeddingSql = {
    // max-width signature from the static sign literals, masked to
    // the COUNT(*)-selected width; arm b participates only when the
    // recall dial keeps it (b < wp.nb) — see the dials note above;
    // the string is still scale-factor-agnostic
    val arms = (0 until embMaxBands).map(b =>
      s"SELECT vec_id, label, $b AS band_idx, " +
        s"${VectorFunctions.lshSigAtSql("e", embMaxPlanes, b * embStride)}" +
        s" % (CAST(1 AS BIGINT) << wp.p) AS band_sig FROM v, wp WHERE $b < wp.nb")
      .mkString("\n  UNION ALL ")
    val nbCase = (1 to embMaxPlanes)
      .map(p => s"WHEN ${if (p < embMaxPlanes) s"p = $p" else "TRUE"} THEN ${embBandsFor(p)}")
      .mkString("CASE ", " ", " END")
    s"""WITH nn AS (SELECT COUNT(*) AS c FROM embeddings),
       |wp AS (
       |  SELECT p, $nbCase AS nb FROM (
       |    SELECT ${VectorFunctions.widthLadderSql(
                      "nn.c", embTargetBucket, embMaxPlanes)} AS p FROM nn)),
       |v AS (
       |  SELECT vec_id, label, embedding AS e,
       |    ${VectorFunctions.normSql("embedding")} AS nrm
       |  FROM embeddings),
       |bands AS (
       |  $arms),
       |cand AS (
       |  SELECT DISTINCT a.vec_id AS a_id, b.vec_id AS b_id
       |  FROM bands a JOIN bands b
       |    ON a.band_idx = b.band_idx AND a.band_sig = b.band_sig
       |    AND a.label = b.label AND a.vec_id < b.vec_id)
       |SELECT a_id, b_id,
       |  ${VectorFunctions.dotSql("va.e", "vb.e", 64)} / (va.nrm * vb.nrm) AS cosine
       |FROM cand
       |JOIN v va ON va.vec_id = a_id
       |JOIN v vb ON vb.vec_id = b_id
       |ORDER BY cosine DESC, a_id, b_id
       |LIMIT 20""".stripMargin
  }

  // ---- dedup_chunks: sequence-level exact dedup ----
  // Lee et al. 2021 ("Deduplicating Training Data Makes Language
  // Models Better") deduplicate exact SUBSTRINGS, not just whole
  // documents: a doc that embeds a verbatim copied passage keeps its
  // novel text but the copied span is flagged. Suffix arrays don't
  // distribute; the standard distributed realization is fixed-width
  // token windows — here non-overlapping 16-token chunks, hashed
  // with the shared cross-engine rolling hash. An occurrence is a
  // duplicate iff an earlier (doc_id, chunk_idx) occurrence of the
  // same chunk hash exists anywhere in the corpus; the first
  // occurrence is the canonical owner (same keeper rule as
  // dedup_exact's min doc_id).
  //
  // Scale shape: chunking is row-local (one codegen pass), then the
  // COUNTING form of first-occurrence: min(struct(doc_id, chunk_idx))
  // per chunk_hash — a hash AGGREGATE with map-side partial combine,
  // not a window. The r13 window form (row_number over chunk_hash)
  // paid a full (hash, doc, idx) sort-exchange of every chunk
  // instance; the aggregate ships one combined (hash → min owner)
  // pair per distinct hash per map partition and never sorts. A
  // doc's duplicate count falls out arithmetically: exactly one
  // instance per hash is globally first, so n_dup = n_chunks −
  // #hashes this doc owns; n_chunks itself is ceil(n_tok/16) — pure
  // row-local arithmetic on the document row, no explode needed for
  // the denominator. No self-join anywhere — unlike the
  // pair-generating near-dup ops, counting duplicate occurrences is
  // linear in corpus size, and a boilerplate chunk with df = 1e6
  // costs one hot-but-combinable aggregate key, never df² pairs.

  private[graft] val dupChunkSize = 16L

  private def dedupChunks(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables(spark, dir).documents
      .select($"doc_id", tokens($"text").as("toks"))
      .withColumn("n_tok", size($"toks").cast(LongType))
      .withColumn("n_chunks",
        expr(s"(n_tok + ${dupChunkSize - 1}L) div ${dupChunkSize}L"))
      // a null-text doc has null n_chunks: the explode branch drops
      // it (as the oracle's UNNEST(range(NULL)) does), so the
      // denominator join must drop it too or the left join would
      // resurrect it as an all-null output row the oracle never emits
      .filter($"n_chunks".isNotNull)
    val chunkHashes = docs
      .select($"doc_id", $"toks",
        explode(sequence(lit(0L), $"n_chunks" - 1L)).as("chunk_idx"))
      .select($"doc_id", $"chunk_idx",
        graft.functions.RollingHash.rolling_hash(array_join(
          expr(s"slice(toks, CAST(chunk_idx * $dupChunkSize + 1 AS INT), $dupChunkSize)"),
          " ")).as("chunk_hash"))
    // min doc_id per hash: the canonical owner DOC is all the count
    // below consumes — which chunk_idx inside the min doc "won" never
    // reaches the output, so the r14 min(struct(doc_id, chunk_idx))
    // bought nothing and cost the plan its hash aggregate: a struct
    // buffer is not HashAggregate-mutable, so Spark planned
    // SortAggregate with a full (chunk_hash) sort on BOTH sides of
    // the exchange (r15 plan audit — the very sorts this operator's
    // doc comment promises away). min(long) restores the codegen
    // hash aggregate with map-side partial combine.
    val owned = chunkHashes
      .groupBy($"chunk_hash")
      .agg(min($"doc_id").as("doc_id"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_first"))
    docs.select($"doc_id", $"n_chunks")
      .join(owned, Seq("doc_id"), "left")
      .withColumn("n_dup_chunks",
        $"n_chunks" - coalesce($"n_first", lit(0L)))
      .select($"doc_id", $"n_chunks", $"n_dup_chunks",
        round($"n_dup_chunks".cast(DoubleType) / $"n_chunks", 6).as("dup_chunk_frac"))
      .resultOrder($"doc_id")
  }

  private val dedupChunksSql =
    s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       |c AS (SELECT doc_id, CAST(ci AS BIGINT) AS chunk_idx,
       |        toks[ci * $dupChunkSize + 1 : ci * $dupChunkSize + $dupChunkSize] AS ctoks
       |      FROM d, UNNEST(range(0, (len(toks) + ${dupChunkSize - 1}) // $dupChunkSize)) AS r(ci)),
       |h AS (SELECT doc_id, chunk_idx,
       |        ${graft.functions.RollingHash.sql("array_to_string(ctoks, ' ')")} AS chunk_hash
       |      FROM c),
       |o AS (SELECT doc_id,
       |        ROW_NUMBER() OVER (PARTITION BY chunk_hash ORDER BY doc_id, chunk_idx) AS occ
       |      FROM h)
       |SELECT doc_id,
       |  COUNT(*) AS n_chunks,
       |  CAST(SUM(CASE WHEN occ > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_chunks,
       |  ROUND(CAST(SUM(CASE WHEN occ > 1 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6) AS dup_chunk_frac
       |FROM o GROUP BY doc_id ORDER BY doc_id""".stripMargin

  val all: Seq[Q] = Seq(
    Q("dedup_exact", dedupExact, Some(dedupExactSql)),
    Q("dedup_chunks", dedupChunks, Some(dedupChunksSql)),
    Q("dedup_canonical", dedupCanonical, Some(dedupCanonicalSql)),
    Q("dedup_url", dedupUrl, Some(dedupUrlSql)),
    Q("dedup_ngram_jaccard", dedupNgram, Some(dedupNgramSql)),
    Q("dedup_incremental", dedupIncremental, Some(dedupIncrementalSql)),
    Q("dedup_minhash_lsh", dedupMinhash, Some(dedupMinhashSql)),
    Q("dedup_simhash", dedupSimhash, Some(dedupSimhashSql)),
    Q("dedup_embedding", dedupEmbedding, Some(dedupEmbeddingSql)),
    Q("dedup_clusters", dedupClusters, Some(dedupClustersSql)),
    Q("dedup_recall_eval", dedupRecallEval, Some(dedupRecallEvalSql))
  )
}
