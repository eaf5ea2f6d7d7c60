package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Count of array elements contained in a fixed word set — the
  * scoring primitive behind text_quality's stopword ratio and
  * text_langid's per-language stopword votes.
  *
  * Why a native Expression and not `size(filter(arr, _.isin(...)))`:
  * Catalyst's higher-order functions (ArrayFilter) do not participate
  * in whole-stage codegen — every token of every document pays an
  * interpreted lambda call plus an In-list walk, on what is otherwise
  * a single codegen'd corpus scan (the same hazard the repo's
  * LshBandSigs/ByteSum/RollingHash kernels exist to avoid). Here the
  * membership loop fuses into the generated stage: one hash-set probe
  * per token, zero boxing. Counting semantics are the multiset count
  * (every occurrence, not distinct — `array_intersect` would change
  * the value), identical to the HOF formulation and to the DuckDB
  * `list_filter` twin.
  */
case class TokenSetCount(child: Expression, words: Seq[String])
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes() = child.dataType match {
    case ArrayType(StringType, _) =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"token_set_count needs array<string>, got $t")
  }

  private def buildSet: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](words.size * 2)
    words.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  // interpreted path rebuilds the set lazily per JVM; the codegen path
  // captures a fresh set into the references array at codegen time
  @transient private lazy val set = buildSet

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    var cnt = 0L
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i) && set.contains(arr.getUTF8String(i))) cnt += 1
      i += 1
    }
    cnt
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val setRef = ctx.addReferenceObj("tokenSet", buildSet, "java.util.HashSet")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val cnt = ctx.freshName("cnt")
      s"""
         |long $cnt = 0L;
         |int $n = $c.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$c.isNullAt($i) && $setRef.contains($c.getUTF8String($i))) $cnt++;
         |}
         |${ev.value} = $cnt;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TokenSetCount {
  import org.apache.spark.sql.GraftShim

  /** Column API: token_set_count(arr, words). */
  def token_set_count(c: Column, words: Seq[String]): Column =
    GraftShim.column(TokenSetCount(GraftShim.expression(c), words))
}
