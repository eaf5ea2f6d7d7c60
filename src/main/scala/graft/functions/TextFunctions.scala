package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text primitives for the LLM-data-pipeline operators (SURVEY §2c).
  *
  * Everything here is a codegen'd `functions._`/higher-order-function
  * chain — no UDFs — so the hot path stays inside whole-stage codegen
  * and the same expression can be mirrored 1:1 in the DuckDB oracle.
  */
object TextFunctions {

  /** Whitespace tokens of a single-space-separated text. */
  def tokens(text: Column): Column = split(text, " ")

  /** Distinct 3-token shingles ("w1 w2 w3") — the unit for n-gram
    * Jaccard and MinHash dedup. Empty array for texts under 3 tokens.
    *
    * IMPORTANT: `toks` must be a *materialized column reference*
    * (`.withColumn("toks", tokens(text))` first), not `tokens(text)`
    * inline — an inline expression is re-evaluated inside the lambda
    * for every shingle, turning O(n) into O(n²) per document.
    */
  def shingles3(toks: Column): Column =
    when(size(toks) < 3, array().cast("array<string>")).otherwise(
      array_distinct(transform(
        sequence(lit(1), size(toks) - 2),
        i => concat_ws(" ",
          element_at(toks, i), element_at(toks, i + 1), element_at(toks, i + 2)))))

  /** Bag-of-words fingerprint: md5 over the sorted distinct token
    * set. Robust to token order (near-shuffle duplicates collide).
    */
  def bowFingerprint(text: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(tokens(text)))))

  /** 64-bit SimHash over tokens: per bit position, sign of the
    * +1/-1 vote sum across token hashes. Returned as one long.
    * (functions.shiftleft only takes a literal shift, so the
    * column-shift variants go through call_function.)
    *
    * This is the reference higher-order formulation; the production
    * dedup operator computes the identical value via exploded
    * postings + one hash aggregate (interpreted lambdas are ~50×
    * slower) — TextFunctionsSpec asserts the two agree.
    */
  def simhash64(toks: Column): Column = {
    def shl(c: Column, by: Column) = call_function("shiftleft", c, by)
    def shr(c: Column, by: Column) = call_function("shiftright", c, by)
    aggregate(
      transform(sequence(lit(0), lit(63)), j =>
        when(
          aggregate(toks, lit(0L),
            (acc, t) => acc +
              when(shr(xxhash64(t), j).bitwiseAND(lit(1L)) === 1L, 1L)
                .otherwise(-1L)) >= 0L,
          shl(lit(1L), j)).otherwise(lit(0L))),
      lit(0L), (acc, b) => acc.bitwiseOR(b))
  }
}
