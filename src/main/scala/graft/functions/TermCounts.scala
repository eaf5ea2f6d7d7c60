package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-row term multiplicities of a token array, as
  * `array<struct<t: string, c: bigint>>` with terms in ascending
  * binary (Spark string) order — the row-local "tf" kernel behind
  * text_tfidf and text_lm_score: what reaches their first exchange is
  * the (doc, term, count) stream, never raw tokens.
  *
  * Why a native Expression and not a SQL-combinator form: the
  * higher-order-function formulation (`filter(sequence(1, n), i ->
  * element_at(sorted, i) != element_at(sorted, i-1))` zipped into run
  * lengths) names the sorted array from a parent projection, and
  * Catalyst's project collapsing plus InferFiltersFromGenerate inline
  * that reference INTO the lambda bodies and the generator's inferred
  * filter — after which `element_at(array_sort(split(text)), i)`
  * re-splits and re-sorts the document once per element, O(n² log n)
  * per row (measured 10× on the bench corpus). A self-contained
  * kernel is evaluated once per row, sorts once, and stays inside the
  * whole-stage-codegen'd scan projection.
  *
  * Null tokens are skipped (split() never yields them); an empty
  * array yields an empty result, so a downstream explode drops the
  * row — identical to the exploded-groupBy formulation and the DuckDB
  * unnest/GROUP BY twin.
  */
case class TermCounts(child: Expression) extends UnaryExpression {
  override def dataType: DataType = TermCounts.outType
  override def checkInputDataTypes() = child.dataType match {
    case ArrayType(StringType, _) =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"term_counts needs array<string>, got $t")
  }

  override protected def nullSafeEval(input: Any): Any =
    TermCounts.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TermCounts.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TermCounts {
  import org.apache.spark.sql.GraftShim

  private[functions] val outType: DataType = ArrayType(
    StructType(Seq(
      StructField("t", StringType, nullable = false),
      StructField("c", LongType, nullable = false))),
    containsNull = false)

  /** One pass: copy non-null tokens, sort (UTF8String compareTo is
    * the same binary order Spark's string sort uses), run-length
    * encode. Called from both the interpreted and the generated path.
    */
  def compute(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val toks = new Array[UTF8String](n)
    var m = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) { toks(m) = arr.getUTF8String(i); m += 1 }
      i += 1
    }
    if (m == 0) return new GenericArrayData(Array.empty[Any])
    java.util.Arrays.sort(toks.asInstanceOf[Array[AnyRef]], 0, m, null)
    val out = new java.util.ArrayList[Any](math.min(m, 16))
    var runStart = 0
    i = 1
    while (i <= m) {
      if (i == m || toks(i).compareTo(toks(runStart)) != 0) {
        out.add(new GenericInternalRow(
          Array[Any](toks(runStart), (i - runStart).toLong)): InternalRow)
        runStart = i
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Column API: term_counts(arr). */
  def term_counts(c: Column): Column =
    GraftShim.column(TermCounts(GraftShim.expression(c)))
}
