package graft

import org.scalatest.funsuite.AnyFunSuite

/** Registration surface: custom expressions usable from SQL and the
  * planner strategy installed.
  */
class ExtensionsSpec extends AnyFunSuite {
  import TestSpark._

  test("install exposes the native expressions to SQL") {
    GraftExtensions.install(spark)
    val r = spark.sql(
      "SELECT rolling_hash('abc') AS h, " +
        "dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d, " +
        "sum_squares(array(3.0d, 4.0d)) AS s")
      .first()
    assert(r.getLong(0) == 96354L) // (('a'*31+'b')*31+'c') mod 1e9+7
    assert(r.getDouble(1) == 11.0)
    assert(r.getDouble(2) == 25.0)
    val b = spark.sql(
      "SELECT byte_sum('ab') AS s, byte_energy('ab') AS e").first()
    assert(b.getLong(0) == 97L + 98L)
    assert(b.getLong(1) == (97L - 128L) * (97L - 128L) + (98L - 128L) * (98L - 128L))
  }

  test("install registers the TopKPerKey strategy") {
    GraftExtensions.install(spark)
    assert(spark.experimental.extraStrategies
      .exists(_.getClass.getName.contains("TopKStrategy")))
    // idempotent
    GraftExtensions.install(spark)
    assert(spark.experimental.extraStrategies
      .count(_.getClass.getName.contains("TopKStrategy")) == 1)
    assert(spark.experimental.extraOptimizations
      .count(_.getClass.getName.contains("SetOpToFlagAggregate")) == 1)
  }

  // ---- SetOpToFlagAggregate ----

  private def withRuleOff[T](body: => T): T = {
    val saved = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations =
      saved.filterNot(_.getClass.getName.contains("SetOpToFlagAggregate"))
    try body finally spark.experimental.extraOptimizations = saved
  }

  test("same-source INTERSECT rewrites to one scan + flag aggregate") {
    GraftExtensions.install(spark)
    import spark.implicits._
    val t = Tables(spark, sf)
    val urgent = t.orders.filter($"o_orderpriority" === "1-URGENT").select($"o_custkey")
    val low = t.orders.filter($"o_orderpriority" === "5-LOW").select($"o_custkey")
    val q = urgent.intersect(low)
    val opt = q.queryExecution.optimizedPlan.toString
    assert(!opt.contains("Join"), s"set op not rewritten:\n$opt")
    assert(opt.contains("__setop_l"), s"flag aggregate missing:\n$opt")
    // one source scan, not two
    assert("Relation.*orders|FileScan.*orders".r.findAllIn(
      q.queryExecution.executedPlan.toString + opt).size <= 2)
    val got = q.collect().map(_.getLong(0)).sorted
    val expected = withRuleOff {
      urgent.intersect(low).collect().map(_.getLong(0)).sorted }
    assert(got.sameElements(expected))
    assert(got.nonEmpty)
  }

  test("same-source EXCEPT agrees with the built-in plan, nulls included") {
    GraftExtensions.install(spark)
    import spark.implicits._
    // nulls group null-safe in set ops: NULL ∈ both sides must drop
    // out of EXCEPT and survive INTERSECT exactly like the built-in
    val df = Seq[(java.lang.Long, String)](
      (1L, "a"), (2L, "a"), (null, "a"), (2L, "b"), (null, "b"), (3L, "b"))
      .toDF("k", "side")
    df.cache().count()
    val a = df.filter($"side" === "a").select($"k")
    val b = df.filter($"side" === "b").select($"k")
    def norm(rows: Array[org.apache.spark.sql.Row]): Seq[Option[Long]] =
      rows.map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
        .toSeq.sortBy(_.getOrElse(Long.MinValue))
    val exceptGot = norm(a.except(b).collect())
    val intersectGot = norm(a.intersect(b).collect())
    val (exceptExp, intersectExp) = withRuleOff {
      (norm(a.except(b).collect()), norm(a.intersect(b).collect())) }
    assert(exceptGot == exceptExp && exceptGot == Seq(Some(1L)))
    assert(intersectGot == intersectExp &&
      intersectGot == Seq(None, Some(2L)))
    df.unpersist()
  }

  test("different-source set ops are left to the built-in lowering") {
    GraftExtensions.install(spark)
    import spark.implicits._
    val t = Tables(spark, sf)
    val a = t.orders.filter($"o_orderpriority" === "1-URGENT").select($"o_custkey")
    val b = t.customer.select($"c_custkey")
    val opt = a.intersect(b).queryExecution.optimizedPlan.toString
    assert(!opt.contains("__setop_l"), "rule fired across different sources")
    assert(opt.contains("Join"), "built-in semi-join lowering missing")
  }
}
