package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract invariants: SparkEntry is what the round driver
  * consumes; silent breakage here zeroes the correctness gate.
  */
class ContractSpec extends AnyFunSuite {

  test("query names are unique (Map must not drop any)") {
    val names = SparkEntry.allQueries.map(_.name)
    assert(names.distinct.size == names.size,
      names.diff(names.distinct).mkString("duplicates: ", ",", ""))
    assert(SparkEntry.queries.size == names.size)
  }

  test("every oracle belongs to a query and is non-empty SQL") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
    SparkEntry.oracleSql.values.foreach(sql =>
      assert(sql.trim.toUpperCase.startsWith("SELECT") ||
        sql.trim.toUpperCase.startsWith("WITH")))
  }

  test("inventory size matches SURVEY status (131 ops, 130 oracles)") {
    assert(SparkEntry.allQueries.size == 131)
    assert(SparkEntry.oracleSql.size == 130)
    // the single rows-checked survivor is the engine-specific HLL /
    // quantile sketch pair (its KMV twin q27 IS oracle-checked)
    assert(SparkEntry.queries.keySet.diff(SparkEntry.oracleSql.keySet)
      == Set("q20_sketches"))
  }
}
