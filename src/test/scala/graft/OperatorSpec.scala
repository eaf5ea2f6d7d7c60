package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every SURVEY §2 operator: runs on sf0.001 and returns rows.
  * (Value-level correctness is driven by the DuckDB oracle gate —
  * tools/crosscheck.py — these specs guard plan executability and
  * coarse invariants.)
  */
class OperatorSpec extends AnyFunSuite {
  import TestSpark._

  for (q <- SparkEntry.allQueries) {
    test(s"${q.name} executes and is non-empty") {
      assert(q.run(spark, sf).count() > 0)
    }
  }

  test("entry flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key exists in queries") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }
}
