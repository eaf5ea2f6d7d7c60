package graft

import graft.operators.Multimodal
import org.scalatest.funsuite.AnyFunSuite

/** The decode plumbing must produce the stub's features exactly —
  * swap decodeStub for a real codec and these stay the contract.
  */
class MultimodalSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("mapPartitions decode matches an independent local recompute") {
    val got = SparkEntry.queries("mm_decode_batch")(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getLong(3))))
      .toMap
    val docs = Tables(spark, sf).documents
      .select($"doc_id", $"text").collect()
    assert(got.size == docs.length)
    docs.take(50).foreach { d =>
      val bytes = d.getString(1).getBytes("UTF-8")
      val (b, e) = Multimodal.decodeStub(bytes)
      assert(got(d.getLong(0)) == ((bytes.length.toLong, b, e)),
        s"doc ${d.getLong(0)}")
    }
  }

  test("frame sampling covers every 4th frame exactly") {
    val rows = SparkEntry.queries("mm_framesample")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.nonEmpty)
    assert(rows.forall(_._2 % 4 == 0))
    val byDoc = rows.groupBy(_._1)
    val lens = Tables(spark, sf).documents
      .selectExpr("doc_id", "length(text) AS n").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    byDoc.foreach { case (doc, frames) =>
      val expected = (0 until (lens(doc) + 15) / 16).count(_ % 4 == 0)
      assert(frames.length == expected, s"doc $doc")
    }
  }
}
