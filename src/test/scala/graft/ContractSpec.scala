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

  test("inventory size matches SURVEY status (132 ops, 131 oracles)") {
    assert(SparkEntry.allQueries.size == 132)
    assert(SparkEntry.oracleSql.size == 131)
    // the single rows-checked survivor is the engine-specific HLL /
    // quantile sketch pair (its KMV twin q27 IS oracle-checked)
    assert(SparkEntry.queries.keySet.diff(SparkEntry.oracleSql.keySet)
      == Set("q20_sketches"))
  }

  // -- pipeline input-manifest precheck (run_pipeline.py:37-60) --

  test("pipeline precheck passes on a complete input drop") {
    assert(Pipeline.missingInputs(TestSpark.sf).isEmpty)
  }

  test("pipeline precheck reports the COMPLETE missing-file list") {
    val missing = Pipeline.missingInputs("/nonexistent-drop")
    assert(missing.size == Pipeline.requiredInputs.size)
    // every report line names the file, its role, and the failure
    Pipeline.requiredInputs.foreach { case (f, desc) =>
      assert(missing.exists(m => m.contains(f) && m.contains(desc) &&
        m.endsWith("missing")), s"no report for $f")
    }
  }

  test("pipeline precheck flags a truncated (zero-byte) input") {
    import java.nio.file.{Files, Paths}
    val dir = Files.createTempDirectory("graft-precheck").toString
    try {
      Pipeline.requiredInputs.foreach { case (f, _) =>
        Files.createFile(Paths.get(dir, f))
      }
      // all present but empty: every file is flagged as truncated
      val flagged = Pipeline.missingInputs(dir)
      assert(flagged.size == Pipeline.requiredInputs.size)
      assert(flagged.forall(_.endsWith("empty file")))
      // one real byte clears that file's flag
      Files.write(Paths.get(dir, Pipeline.requiredInputs.head._1), Array[Byte](1))
      assert(Pipeline.missingInputs(dir).size == Pipeline.requiredInputs.size - 1)
    } finally {
      Files.list(Paths.get(dir)).forEach(p => Files.deleteIfExists(p))
      Files.deleteIfExists(Paths.get(dir))
    }
  }
}
