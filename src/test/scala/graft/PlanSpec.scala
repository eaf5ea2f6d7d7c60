package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape guards: the physical plans that make these operators
  * scale must not silently regress.
  */
class PlanSpec extends AnyFunSuite {
  import TestSpark._

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("q2 pushes its filters into the parquet scan") {
    val p = plan("q2_filter_project")
    assert(p.contains("PushedFilters: [IsNotNull(o_orderstatus), IsNotNull(o_totalprice), EqualTo(o_orderstatus,F), GreaterThan(o_total"))
  }

  test("q2 prunes the scan to the referenced columns") {
    val p = plan("q2_filter_project")
    assert(p.contains("ReadSchema: struct<o_orderkey:bigint,o_custkey:bigint,o_orderstatus:string,o_totalprice:double>"))
  }

  test("q4 joins dimensions via broadcast, not shuffle") {
    val p = plan("q4_multijoin")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct"))
  }

  test("lineitem scans read only needed columns in q4") {
    val p = plan("q4_multijoin")
    assert(p.contains("struct<l_orderkey:bigint,l_extendedprice:double,l_discount:double>"))
  }

  test("dedup pair generation is equi-join, never cartesian") {
    for (q <- Seq("dedup_ngram_jaccard", "dedup_minhash_lsh", "dedup_simhash")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q has a cartesian product")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q has a nested-loop join")
    }
  }

  test("ann_bruteforce broadcasts the query side only") {
    val p = plan("ann_bruteforce")
    assert(p.contains("BroadcastExchange"))
  }

  test("kpi windows partition by their series keys") {
    val p = plan("kpi_prod_monthly")
    assert(p.contains("hashpartitioning(category"))
  }

  test("corpus select anti-joins its drop-list via broadcast") {
    // without the explicit hint the stats-less checkpointed drop-list
    // is assumed huge and the whole corpus shuffles into a sort-merge
    // anti join. (AQE prints the pre-final plan without join
    // selection — disable it for this inspection.)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val p = plan("llm_corpus_select")
      assert("BroadcastHashJoin .*LeftAnti".r.findFirstIn(p).isDefined,
        "drop-list anti-join is not broadcast")
      assert(!p.contains("SortMergeJoin"), "corpus select shuffles the corpus")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("grouping-sets and histogram aggregate with map-side partials") {
    for (q <- Seq("q29_grouping_sets", "q30_histogram")) {
      val p = plan(q)
      // partial + final HashAggregate pair around one exchange
      assert("HashAggregate".r.findAllIn(p).size >= 2, s"$q lacks partial agg")
      assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"))
    }
  }

  test("rolling_hash participates in whole-stage codegen") {
    // AQE prints the pre-execution plan without codegen regions;
    // disable it for this inspection only
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val p = plan("text_rollhash")
      assert(p.toLowerCase.contains("rollinghash"), "RollingHash not in plan")
      // the projection containing RollingHash must sit inside a
      // WholeStageCodegen region — printed as a "*(n)" stage prefix —
      // not fall back to interpreted eval
      val projLine = p.linesIterator.find(_.toLowerCase.contains("rollinghash")).get
      assert(projLine.contains("*("), s"projection not codegen'd: $projLine")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }
}
