package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract invariants: SparkEntry is what the round driver
  * consumes; silent breakage here zeroes the correctness gate.
  */
class ContractSpec extends AnyFunSuite {

  test("measured shuffle-width dial: clamps, growth, fragment, missing dir") {
    // sf0.001 is well under 2 MB -> floor of 4; sf0.1 (~17.5 MB) sits
    // on the measured optimum's neighborhood (~9); both grow strictly
    // with the dir so the dial is data-driven, not a bench constant
    val tiny = GraftSession.measuredShuffleParts("/root/testdata/sf0.001", 32)
    val mid = GraftSession.measuredShuffleParts("/root/testdata/sf0.1", 32)
    assert(tiny.contains(4), s"tiny dir must clamp to the floor, got $tiny")
    assert(mid.exists(p => p > 4 && p <= 16), s"sf0.1 expected ~9, got $mid")
    // source-parameter fragments ride the dir string (Params) and must
    // not break the file walk
    assert(GraftSession.measuredShuffleParts(
      "/root/testdata/sf0.001#yf=1996&yt=1998", 32) == tiny)
    // a missing dir is None (fall back to the builder default), never
    // a throw at session construction
    assert(GraftSession.measuredShuffleParts("/no/such/dir", 32).isEmpty)
    // the cap scales with cores and survives degenerate cpu counts
    val tmp = java.nio.file.Files.createTempDirectory("graft-dial")
    val f = new java.io.RandomAccessFile(tmp.resolve("big.bin").toFile, "rw")
    try f.setLength(200L << 20) finally f.close() // sparse 200 MB
    try {
      assert(GraftSession.measuredShuffleParts(tmp.toString, 2).contains(64),
        "200 MB at cpus=2 must hit the 32*cpus cap")
      assert(GraftSession.measuredShuffleParts(tmp.toString, 0).contains(4),
        "cap must never fall below the floor of 4")
    } finally {
      java.nio.file.Files.deleteIfExists(tmp.resolve("big.bin"))
      java.nio.file.Files.deleteIfExists(tmp)
    }
  }

  test("measured relayout-width dial: floor, growth, cap") {
    // tiny sources clamp to the floor of 8 (partition-crossing
    // semantics stay exercised at test SFs)
    assert(Tables.splitFilesFor(0L) == 8)
    assert(Tables.splitFilesFor(600L << 10) == 8) // sf0.1 documents
    // sf0.1 lineitem (~11 MB) still floors at 8; growth is strictly
    // data-driven past the floor (~2 MB of source per file)
    assert(Tables.splitFilesFor(11L << 20) == 8)
    assert(Tables.splitFilesFor(64L << 20) == 32)
    assert(Tables.splitFilesFor(100L << 20) == 50)
    // the cap bounds the LOCAL tmp relayout only; past ~512 MB per
    // table local[N] is not the design point
    assert(Tables.splitFilesFor(10L << 30) == 256)
    // monotone in bytes (a bigger source never gets fewer files)
    val pts = Seq(0L, 1L << 20, 16L << 20, 128L << 20, 1L << 30, 8L << 30)
    pts.zip(pts.tail).foreach { case (a, b) =>
      assert(Tables.splitFilesFor(a) <= Tables.splitFilesFor(b)) }
  }

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

  test("inventory size matches SURVEY status (136 ops, 135 oracles)") {
    assert(SparkEntry.allQueries.size == 136)
    assert(SparkEntry.oracleSql.size == 135)
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
