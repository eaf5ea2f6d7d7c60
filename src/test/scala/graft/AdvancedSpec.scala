package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantics of the advanced/approximate operators. */
class AdvancedSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("KmvAgg keeps the k smallest distinct hashes (reduce + merge laws)") {
    val agg = new graft.functions.KmvAgg(4)
    // reduce: dedup, sorted insert, cap at k, reject above-kth fast path
    var s = agg.zero
    for (h <- Seq(50L, 10L, 30L, 10L, 70L, 20L, 40L, 60L)) s = agg.reduce(s, h)
    assert(s.toSeq == Seq(10L, 20L, 30L, 40L))
    // merge: sorted-distinct union truncated to k, overlap taken once
    val m = agg.merge(Array(10L, 30L, 50L), Array(10L, 20L, 60L, 70L))
    assert(m.toSeq == Seq(10L, 20L, 30L, 50L))
    // merge with empty is identity
    assert(agg.merge(agg.zero, Array(5L, 6L)).toSeq == Seq(5L, 6L))
    assert(agg.merge(Array(5L, 6L), agg.zero).toSeq == Seq(5L, 6L))
  }

  test("q27 typed KMV aggregator equals the rank-then-truncate formulation") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    // the window formulation the Aggregator replaced — kept here as
    // the semantic pin: same k-mins per group by definition
    val h = graft.functions.RollingHash.rolling_hash(
      concat(lit("k|"), col("o_custkey").cast("string")))
    val w = Window.partitionBy(col("o_orderstatus")).orderBy(col("h"))
    val windowed = Tables(spark, sf).orders
      .select(col("o_orderstatus"), h.as("h")).distinct()
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 64)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_kept"), max(col("h")).as("h_k"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val sketched = q("q27_kmv_sketch").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // q27 output carries exact_distinct/estimate; re-derive n_kept/h_k
    val kmv = udaf(new graft.functions.KmvAgg(64),
      org.apache.spark.sql.Encoders.scalaLong)
    val aggd = Tables(spark, sf).orders
      .select(col("o_orderstatus"), h.as("h"))
      .groupBy(col("o_orderstatus")).agg(kmv(col("h")).as("mins"))
      .select(col("o_orderstatus"), size(col("mins")).cast("long").as("n_kept"),
        array_max(col("mins")).as("h_k"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(aggd == windowed)
    assert(sketched.keySet == windowed.keySet)
  }

  test("sketches track exact values within tolerance") {
    val approx = q("q20_sketches").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val exact = q("q16_percentiles").collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap // exact median
    val exactCusts = q("q7_distinct").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((status, (apxCust, apxMed)) <- approx) {
      val relCust = math.abs(apxCust - exactCusts(status)).toDouble / exactCusts(status)
      assert(relCust < 0.1, s"$status approx distinct off by $relCust")
      val relMed = math.abs(apxMed - exact(status)) / exact(status)
      assert(relMed < 0.05, s"$status approx median off by $relMed")
    }
  }

  test("q20 HLL estimate stays in the ±5% band around q27's oracle-checked exact count") {
    // q20 is the single rows-only inventory entry (sketch internals
    // are engine-specific, so no cross-engine hash) — this pins its
    // VALUES to the same column's exact distinct count, which IS
    // oracle-checked through q27_kmv_sketch
    val exact = q("q27_kmv_sketch").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = q("q20_sketches").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    for ((status, apx) <- approx) {
      val rel = math.abs(apx - exact(status)).toDouble / exact(status)
      assert(rel <= 0.05, s"$status HLL estimate off by $rel (>5% of exact)")
    }
  }

  test("ann_ivf results are a subset of per-cluster exact ranking") {
    // every returned neighbor must share the probed cluster and carry
    // the same cosine the brute-force path computes
    val brute = q("ann_bruteforce").collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    val ivf = q("ann_ivf").collect()
    assert(ivf.nonEmpty)
    ivf.foreach { r =>
      brute.get((r.getLong(0), r.getLong(2)))
        .foreach(c => assert(math.abs(c - r.getDouble(3)) < 1e-12))
    }
  }

  test("as-of join gap is non-negative and purchase-anchored") {
    val rows = q("q14_asof_join").collect()
    assert(rows.nonEmpty)
    rows.filter(!_.isNullAt(4)).foreach(r => assert(r.getDouble(4) >= 0))
  }

  test("range join counts only events in the window") {
    // cross-check a couple of anchors against a local recompute
    import org.apache.spark.sql.functions._
    val ev = Tables(spark, sf).events
      .select($"event_id", $"user_id", unix_micros($"ts").as("us"),
        $"event_type").collect()
    val byUser = ev.groupBy(_.getLong(1))
    val expected = ev.filter(_.getString(3) == "error").map { e =>
      val cnt = byUser(e.getLong(1)).count { x =>
        x.getLong(2) > e.getLong(2) && x.getLong(2) <= e.getLong(2) + 300000000L
      }
      e.getLong(0) -> cnt.toLong
    }.toMap
    val got = q("q15_range_join").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
  }

  test("text_lm_score matches a sequential unigram-surprisal recompute") {
    val docs = Tables(spark, sf).documents
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val counts = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
    docs.foreach { case (_, t) => t.split(" ", -1).foreach(w => counts(w) += 1) }
    val n = counts.values.sum
    def surp(w: String): Long = 63L - java.lang.Long.numberOfLeadingZeros(n / counts(w))
    val expected = docs.map { case (id, t) =>
      val toks = t.split(" ", -1)
      val total = toks.map(surp).sum
      id -> ((toks.length.toLong, total, 1000L * total / toks.length))
    }.toMap
    val got = q("text_lm_score").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == expected)
  }

  test("q31 RANGE frames follow the month axis, ROWS frames the row stream") {
    val rows = q("q31_range_frame").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getLong(4), r.getDouble(5), r.getLong(6)))
    assert(rows.nonEmpty)
    // sequential recompute of BOTH frame semantics from the series
    // itself: trailing-3-rows vs trailing-2-months
    rows.groupBy(_._1).foreach { case (_, series) =>
      val s = series.sortBy(_._2)
      s.zipWithIndex.foreach { case ((_, idx, _, sr, nr, sg, ng), i) =>
        val rowsFrame = s.slice(math.max(0, i - 2), i + 1)
        val rangeFrame = s.filter(x => x._2 >= idx - 2 && x._2 <= idx)
        assert(nr == rowsFrame.size && ng == rangeFrame.size)
        assert(math.abs(sr - rowsFrame.map(_._3).sum) < 1e-6)
        assert(math.abs(sg - rangeFrame.map(_._3).sum) < 1e-6)
      }
    }
    // the gap driver must actually produce divergence somewhere —
    // otherwise the test (and the operator) degenerates to ROWS
    assert(rows.exists(r => r._5 != r._7),
      "no month gaps: RANGE and ROWS frames never diverged")
  }

}
