package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** K-minimum-values distinct-count sketch as a typed [[Aggregator]] —
  * the production form of q27's KMV (reference semantics:
  * eda.py-style distinct stats at a scale where exact countDistinct
  * is too hot). State is the k smallest DISTINCT hash values seen so
  * far, kept as a sorted long array:
  *
  *  - bounded: never more than k longs per group, regardless of input
  *    size — the property that makes the sketch safe on a 100 TB hot
  *    group (the window-rank formulation this replaces shuffled EVERY
  *    distinct hash of the group to one partition before truncating);
  *  - map-side combinable: Spark plans it as ObjectHashAggregate with
  *    a partial pass per input partition and a k-long merge at the
  *    exchange, so shuffle volume is k·groups, not distinct·groups;
  *  - deterministic: membership dedup means duplicate hashes are
  *    no-ops, so the result is row-order independent and identical to
  *    the rank-then-truncate formulation (the DuckDB oracle keeps
  *    that formulation — same k-mins, exact parity).
  *
  * reduce is O(log k + k) worst case (binary search + shift insert);
  * values above the current k-th minimum are rejected in O(log k),
  * which is the overwhelmingly common case once the state fills.
  */
class KmvAgg(k: Int) extends Aggregator[Long, Array[Long], Array[Long]] {
  require(k > 0, "KMV k must be positive")

  override def zero: Array[Long] = Array.emptyLongArray

  override def reduce(b: Array[Long], h: Long): Array[Long] = {
    val pos = java.util.Arrays.binarySearch(b, h)
    if (pos >= 0) b // duplicate hash: already a member, no-op
    else {
      val ins = -pos - 1
      if (ins >= k) b // not among the k smallest
      else {
        val n = math.min(b.length + 1, k)
        val out = new Array[Long](n)
        System.arraycopy(b, 0, out, 0, ins)
        out(ins) = h
        System.arraycopy(b, ins, out, ins + 1, n - ins - 1)
        out
      }
    }
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    // merge two sorted-distinct states, keeping the k smallest uniques
    val out = new Array[Long](math.min(a.length + b.length, k))
    var i = 0
    var j = 0
    var o = 0
    while (o < out.length && (i < a.length || j < b.length)) {
      val v =
        if (j >= b.length) { i += 1; a(i - 1) }
        else if (i >= a.length) { j += 1; b(j - 1) }
        else if (a(i) < b(j)) { i += 1; a(i - 1) }
        else if (a(i) > b(j)) { j += 1; b(j - 1) }
        else { i += 1; j += 1; a(i - 1) } // same hash in both: take once
      out(o) = v
      o += 1
    }
    if (o < out.length) java.util.Arrays.copyOf(out, o) else out
  }

  override def finish(r: Array[Long]): Array[Long] = r

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder()
}
