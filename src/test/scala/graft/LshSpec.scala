package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorFunctions

/** The LSH signature-width dial (VectorFunctions.lshPlanesFor): the
  * mechanism that keeps sign-bucket populations constant as the
  * corpus scales, so bucket-blocked candidate generation (ann_lsh,
  * dedup_embedding) never degenerates into an all-pairs scan.
  */
class LshSpec extends AnyFunSuite {
  import TestSpark._

  test("ann_index_stats reconciles with the index it reports on") {
    val r = SparkEntry.queries("ann_index_stats")(spark, sf).collect().head
    val nVec = Tables(spark, sf).embeddings.count()
    assert(r.getLong(0) == nVec)
    val (buckets, maxPop, minPop, pairWork) =
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(5))
    assert(buckets >= 1 && buckets <= nVec)
    assert(minPop >= 1 && maxPop >= minPop && maxPop <= nVec)
    // each bucket of p contributes p(p-1)/2 >= p-1 candidate pairs
    assert(pairWork >= nVec - buckets)
    assert(r.getLong(6) == 1000L * nVec / buckets)
  }

  test("adc_sum kernel equals the per-subspace map lookups and compiles under codegen") {
    // the kernel is the inner loop of ann_pq/ann_ivfpq's scoring join;
    // with fallback disabled a janino failure throws instead of
    // silently running interpreted. Equality target: the previous
    // formulation Σ_m element_at(dmap_m, code_m), which remains the
    // DuckDB oracle's shape.
    import spark.implicits._
    val prev = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val rnd = new scala.util.Random(7)
      val slots = 8
      val rows = (0 until 64).map { i =>
        (i.toLong,
          Seq.fill(4 * slots)(rnd.nextInt(1 << 20).toLong),
          Seq.fill(4)(rnd.nextInt(slots)))
      }
      val df = rows.toDF("id", "lut", "codes")
      val mapForm = (0 until 4).map(m =>
        element_at(
          map_from_arrays(
            sequence(lit(0), lit(slots - 1)),
            slice($"lut", m * slots + 1, slots)),
          element_at($"codes", m + 1))).reduceLeft(_ + _)
      df.select($"id",
          graft.functions.AdcSum.adc_sum($"lut", $"codes").as("k"),
          mapForm.as("m"))
        .collect()
        .foreach(r => assert(r.getLong(1) == r.getLong(2),
          s"row ${r.getLong(0)}: kernel ${r.getLong(1)} != map ${r.getLong(2)}"))
      // shape disagreements fail loudly, never null/garbage
      val bad = Seq((Seq(1L, 2L, 3L), Seq(0, 0))).toDF("lut", "codes")
      val e = intercept[Exception] {
        bad.select(graft.functions.AdcSum.adc_sum($"lut", $"codes")).collect()
      }
      assert(e.getMessage != null)
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.codegen.fallback", v)
        case None => spark.conf.unset("spark.sql.codegen.fallback")
      }
    }
  }

  test("ann_pq matches a sequential product-quantization recompute") {
    val rows = Tables(spark, sf).embeddings.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    val gmax = rows.iterator.flatMap(_._2).map(x => math.abs(x.toDouble)).max
    val gscale = math.max(gmax, 1e-30) / 127.0
    val qvec = rows.map { case (id, e) =>
      id -> e.map(x => (x.toDouble / gscale).toInt) }.toMap
    val seedIds = qvec.keys.filter(id => id % 50 == 0 && id < 400).toSeq.sorted
    def subDist(a: Array[Int], b: Array[Int], m: Int): Long = {
      var s = 0L; var i = m * 16
      while (i < m * 16 + 16) { val d = (a(i) - b(i)).toLong; s += d * d; i += 1 }
      s
    }
    def codes(v: Array[Int]): IndexedSeq[Int] = (0 until 4).map { m =>
      seedIds.indices.minBy(idx => (subDist(v, qvec(seedIds(idx)), m), idx))
    }
    val queries = qvec.keys.filter(_ % 50 == 0).toSeq.sorted
    val expected = queries.flatMap { qid =>
      qvec.keys.filter(_ != qid).map { vid =>
        val c = codes(qvec(vid))
        val d = (0 until 4).map(m => subDist(qvec(qid), qvec(seedIds(c(m))), m)).sum
        (vid, d)
      }.toSeq.sortBy { case (vid, d) => (d, vid) }.take(5)
        .zipWithIndex.map { case ((vid, d), i) => (qid, i + 1L, vid, d) }
    }.toSet
    val got = SparkEntry.queries("ann_pq")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong, r.getLong(2), r.getLong(3))).toSet
    assert(got == expected)
  }

  test("integer pagerank matches a sequential recompute on a handmade graph") {
    import spark.implicits._
    import graft.operators.Similarity
    // star into node 0, back-edges 0 -> {1, 2}, node 4 isolated (gets
    // base-mass only), node 3 dangling-in (contributes, receives none)
    val nodes = Seq(0L, 1L, 2L, 3L, 4L).toDF("id")
    val edges = Seq((1L, 0L), (2L, 0L), (3L, 0L), (0L, 1L), (0L, 2L))
      .toDF("src", "dst")
    val got = Similarity.pagerankRanks(nodes, edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val S = Similarity.prScale
    val n = 5L
    val out = Map(1L -> Seq(0L), 2L -> Seq(0L), 3L -> Seq(0L), 0L -> Seq(1L, 2L))
    var r = (0L to 4L).map(_ -> S / n).toMap
    for (_ <- 1 to Similarity.prIters) {
      val contrib = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
      for ((u, vs) <- out; v <- vs) contrib(v) += r(u) / vs.size
      r = (0L to 4L).map(v => v ->
        (((S / Similarity.prDampDen) * Similarity.prBaseNum) / n +
          (Similarity.prDampNum * contrib(v)) / Similarity.prDampDen)).toMap
    }
    assert(got == r, s"got $got expected $r")
    // structure sanity: the hub outranks its spokes, isolation ranks last
    assert(got(0L) > got(1L) && got(1L) > got(4L))
  }

  test("growth law: one extra plane per corpus doubling") {
    // 2^32 = 8·2^29 sits exactly on a power-of-two ratio, where a
    // floating log2 overshoots (log(2^29)/log(2) = 29.000000000000004)
    for (n <- Seq(100L, 1000L, 50000L, 10000000L, 1L << 32, 1L << 40)) {
      val p = VectorFunctions.lshPlanesFor(n)
      assert(VectorFunctions.lshPlanesFor(2 * n) == p + 1,
        s"doubling $n must add exactly one plane")
    }
  }

  test("expected bucket size stays in (target/2, target] at any scale") {
    val t = 8L
    for (n <- Seq(9L, 100L, 2000L, 1000000L, 10000000000L, 1L << 32, (1L << 33) + 1)) {
      val p = VectorFunctions.lshPlanesFor(n, t)
      val expected = n.toDouble / (1L << p)
      assert(expected <= t && expected > t / 2.0,
        s"n=$n planes=$p expected bucket $expected outside (${t / 2.0}, $t]")
    }
  }

  test("probe stride caps the query set at probeMaxQueries and never moves below the cap") {
    import graft.operators.Similarity.{probeBaseStride, probeMaxQueries, probeStrideFor}
    // below the cap the stride is exactly the historical 50: every
    // committed-gate SF (sf0.001..sf1 = 500..20k vectors) unchanged
    for (n <- Seq(500L, 2000L, 20000L, 50000L))
      assert(probeStrideFor(n) == probeBaseStride, s"n=$n")
    // above it, query count stays ≤ probeMaxQueries, the stride stays
    // a multiple of the base (so the capped probe set is a SUBSET of
    // the uncapped one), and it is the smallest such multiple
    for (n <- Seq(50001L, 200000L, 2000000L, 50000000L, 1L << 40)) {
      val s = probeStrideFor(n)
      assert(s % probeBaseStride == 0, s"n=$n stride=$s not a base multiple")
      // dense 0-based ids: queries = floor((n-1)/s) + 1
      assert((n - 1) / s + 1 <= probeMaxQueries, s"n=$n stride=$s over cap")
      val prev = s - probeBaseStride
      assert(prev == 0 || (n - 1) / prev + 1 > probeMaxQueries,
        s"n=$n stride=$s not minimal")
    }
    assert(probeStrideFor(200000L) == 200L, "sf10 must sample every 200th")
    assert(probeStrideFor(2000000L) == 2000L, "sf100 must sample every 2000th")
  }

  test("the pinned oracle widths equal the dial at the bench corpus") {
    // embeddings.parquet has 2000 rows at sf0.1 (the driver's bench
    // SF); ann_lsh's static DuckDB twin forces a pinned constant, and
    // this keeps the pin honest against the mechanism. dedup_embedding
    // is ADAPTIVE since r14 — its dial must land on the same 8 planes
    // at the bench corpus (sf0.1 comparability), then keep growing.
    assert(graft.operators.Similarity.lshPlanes ==
      VectorFunctions.lshPlanesFor(2000))
    assert(graft.operators.Dedup.embPlanesFor(2000) ==
      VectorFunctions.lshPlanesFor(2000))
    assert(graft.operators.Dedup.embPlanesFor(200000) == 15,
      "sf10 corpus must widen the signature (the r13 pin saturated there)")
    assert(graft.operators.Dedup.embPlanesFor(100000000L) ==
      graft.operators.Dedup.embMaxPlanes,
      "the lane ceiling clamps the dial, it must not overrun the stride")
  }

  test("the SQL width ladder selects exactly the Scala dial at every boundary") {
    // parse the GENERATED string back into (threshold, plane) arms —
    // not a re-implementation, so an off-by-one in widthLadderSql's
    // comparison or arm order fails here — and evaluate its
    // first-matching-arm CASE semantics against widthFor at the
    // power-of-two pivots and their neighbors, the exact places a
    // float log2 would put the boundary one plane off
    val (t, maxP) = (8L, 16)
    val sql = VectorFunctions.widthLadderSql("n", t, maxP)
    val armRe = """WHEN n <= (\d+) THEN (\d+)""".r
    val arms = armRe.findAllMatchIn(sql)
      .map(m => (m.group(1).toLong, m.group(2).toInt)).toList
    val elseRe = """ELSE (\d+) END""".r
    val elseP = elseRe.findFirstMatchIn(sql).get.group(1).toInt
    assert(arms.nonEmpty && sql.indexOf("WHEN") < sql.indexOf("ELSE"))
    assert(arms == arms.sortBy(_._1),
      "CASE arms must ascend or first-match semantics break")
    def ladder(n: Long): Int =
      arms.find { case (thr, _) => n <= thr }.map(_._2).getOrElse(elseP)
    val pivots = (1 until maxP).flatMap { p =>
      val b = t * (1L << p); Seq(b - 1, b, b + 1)
    } ++ Seq(0L, 1L, 2L, t, 10L * t * (1L << maxP))
    pivots.foreach { n =>
      assert(ladder(n) == VectorFunctions.widthFor(n, t, maxP),
        s"ladder and dial disagree at n=$n")
    }
  }

  test("the recall dial grows bands as planes grow, within the sign pool") {
    import graft.operators.Dedup
    // at the bench corpus: the r13 operating point exactly
    assert(Dedup.embBandsFor(Dedup.embPlanesFor(2000)) == 8)
    // one band schedule per plane count, monotone, pool-bounded
    val bs = (1 to Dedup.embMaxPlanes).map(Dedup.embBandsFor)
    assert(bs == bs.sorted, s"band schedule must be monotone: $bs")
    assert(bs.last == Dedup.embMaxBands &&
      Dedup.embMaxBands * Dedup.embStride <= VectorFunctions.lshSignRows)
    // the recall law itself: at every in-pool (p, b) point the
    // planted cos-0.9 OR-recall stays >= 90% until the band ceiling
    val s = 1.0 - math.acos(0.9) / math.Pi
    (1 to Dedup.embMaxPlanes).foreach { p =>
      val b = Dedup.embBandsFor(p)
      val recall = 1.0 - math.pow(1.0 - math.pow(s, p), b)
      if (b < Dedup.embMaxBands)
        assert(recall >= 0.90, f"recall $recall%.3f at p=$p b=$b")
    }
  }

  test("measured bucket occupancy stays near-constant across SFs") {
    // the data-backed half of the growth law: sign the two corpora
    // with their own derived widths and compare MEAN occupancy — a
    // fixed width would grow it 4× from n=500 to n=2000; the dial
    // must hold it within noise of constant (clustered embeddings
    // make buckets non-uniform, so the bound is a band, not equality)
    def meanOccupancy(dir: String): (Long, Double) = {
      val e = Tables(spark, dir).embeddings
      val n = e.count()
      val planes = VectorFunctions.lshPlanesFor(n)
      val buckets = e
        .select(VectorFunctions.lshSig(col("embedding"), planes).as("b"))
        .groupBy("b").count()
        .agg(avg("count")).head().getDouble(0)
      (n, buckets)
    }
    val (n1, occ1) = meanOccupancy("/root/testdata/sf0.001")
    val (n2, occ2) = meanOccupancy("/root/testdata/sf0.1")
    assert(n1 == 500 && n2 == 2000, s"corpus sizes moved: $n1, $n2")
    info(f"occupancy n=$n1%d → $occ1%.1f, n=$n2%d → $occ2%.1f")
    // 4× the data must NOT mean 4× the bucket: allow ±2× drift
    assert(occ2 <= occ1 * 2.0 && occ2 >= occ1 / 2.0,
      f"occupancy drifted $occ1%.1f → $occ2%.1f under the derived widths")
  }
}
