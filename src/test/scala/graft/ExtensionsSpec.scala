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
  }

  test("install registers the TopKPerKey strategy") {
    GraftExtensions.install(spark)
    assert(spark.experimental.extraStrategies
      .exists(_.getClass.getName.contains("TopKStrategy")))
    // idempotent
    GraftExtensions.install(spark)
    assert(spark.experimental.extraStrategies
      .count(_.getClass.getName.contains("TopKStrategy")) == 1)
  }
}
