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

  test("llm_mix_epochs: every doc appears exactly its source-factor times") {
    val rows = SparkEntry.queries("llm_mix_epochs")(spark, sf).collect()
    val perDoc = rows.groupBy(_.getLong(0))
    perDoc.foreach { case (id, g) =>
      val n = g.head.getLong(2)
      assert(g.length == n, s"doc $id: ${g.length} rows, factor $n")
      assert(g.map(_.getLong(3)).sorted.sameElements(1L to n), s"doc $id epochs")
      // repeats of one doc get distinct interleave keys (they must
      // not cluster in training order)
      assert(g.map(_.getLong(4)).distinct.length == g.length, s"doc $id keys")
      val factor = 1L + graft.functions.RollingHash.hash(
        "epoch|" + g.head.getString(1)) % 3L
      assert(n == factor, s"doc $id factor")
    }
    // the schedule actually repeats something and not everything
    val fs = perDoc.values.map(_.head.getLong(2)).toSet
    assert(fs.size > 1, s"degenerate factors $fs")
  }

  test("llm_bpe_stats equals a sequential BPE pair-count model") {
    import spark.implicits._
    // independent model: word frequencies, then adjacent char-pair
    // counts weighted by word freq — the Sennrich merge statistic
    val words = Tables(spark, sf).documents.select($"text").collect()
      .flatMap(_.getString(0).split(" "))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val pairCounts = scala.collection.mutable.Map.empty[String, Long]
    for ((w, f) <- words; i <- 0 until w.length - 1) {
      val p = w.substring(i, i + 2)
      pairCounts(p) = pairCounts.getOrElse(p, 0L) + f
    }
    val want = pairCounts.toSeq.sortBy { case (p, c) => (-c, p) }.take(20)
    val got = SparkEntry.queries("llm_bpe_stats")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == want, s"got=${got.take(3)} want=${want.take(3)}")
  }
}
