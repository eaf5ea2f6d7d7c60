package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** `adc_sum(lut, codes)`: asymmetric-distance (ADC) scoring of one PQ
  * code row against one query's packed lookup table — the inner loop
  * of ann_pq / ann_ivfpq (Jégou et al., TPAMI 2011 §IV.A).
  *
  * `lut` is the query's per-subspace centroid distances packed
  * subspace-major into ONE `array<long>` (entry m·n + i = distance of
  * the query's m-th subvector to centroid i; n = slots per subspace,
  * derived at runtime as lut.length / codes.length). `codes` is the
  * corpus row's PQ code per subspace. Result: Σ_m lut[m·n + codes[m]]
  * — identical integer arithmetic to the previous per-subspace-map
  * form (Σ_m element_at(dmap_m, code_m)), which remains the DuckDB
  * oracle's formulation.
  *
  * Exists because the map form paid, per scored pair, pqSubspaces
  * UnsafeMapData key scans (up to n key compares each) plus the
  * per-query row weight of four boxed map columns riding the
  * broadcast; this kernel is pqSubspaces direct primitive-array reads
  * fused into whole-stage codegen, and the probe row carries one flat
  * long array. On the scoring joins' M·N pairs that constant is the
  * whole cost of the operator (sf1: 8M pairs for ann_pq).
  *
  * Fails loudly (not null/garbage) when lut.length is not an exact
  * multiple of codes.length or a code falls outside its subspace's
  * slot range — either means the index build and the query tables
  * disagree, a correctness bug upstream.
  */
case class AdcSum(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"adc_sum needs (array<bigint> lut, array<int> codes), got $l, $r")
    }

  override protected def nullSafeEval(l: Any, r: Any): Any =
    AdcSum.score(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (lut, codes) =>
      // one static call per scored pair; the loop body is JIT-compiled
      // Scala over primitive ArrayData reads (LshBandSigs pattern —
      // same fusion, none of the Janino method-size risk)
      s"${ev.value} = graft.functions.AdcSum.score($lut, $codes);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object AdcSum {
  import org.apache.spark.sql.GraftShim

  def score(lut: ArrayData, codes: ArrayData): Long = {
    val m = codes.numElements()
    val total = lut.numElements()
    if (m == 0 || total % m != 0)
      throw new IllegalStateException(
        s"adc_sum: lut length $total is not a multiple of $m subspaces — " +
          "index codes and query LUT were built from different PQ shapes")
    val n = total / m
    var sum = 0L
    var i = 0
    while (i < m) {
      val c = codes.getInt(i)
      if (c < 0 || c >= n)
        throw new IllegalStateException(
          s"adc_sum: code $c out of range [0,$n) in subspace $i — " +
            "index codes and query LUT disagree on centroid slots")
      sum += lut.getLong(i * n + c)
      i += 1
    }
    sum
  }

  /** Column API: adc_sum(lut, codes). */
  def adc_sum(lut: Column, codes: Column): Column =
    GraftShim.column(AdcSum(GraftShim.expression(lut), GraftShim.expression(codes)))
}
