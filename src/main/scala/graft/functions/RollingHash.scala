package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial rolling hash (base 31, mod 1e9+7) over a string's
  * bytes — the classic document-fingerprint primitive (SURVEY §2c).
  *
  * A native Catalyst `Expression` with `doGenCode`, so it fuses into
  * whole-stage codegen instead of breaking the pipeline like a Scala
  * UDF would: the generated loop runs over the UTF8String bytes with
  * zero boxing or serialization.
  *
  * The fold (h·31 + byte) mod p is order-dependent by design and
  * exactly reproducible in integer arithmetic on any engine — the
  * DuckDB oracle mirrors it with list_reduce over ascii codes.
  */
case class RollingHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes() = child.dataType match {
    case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"rolling_hash needs a string argument, got $t")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = (h * RollingHash.Base + (bytes(i) & 0xFF)) % RollingHash.P
      i += 1
    }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      s"""
         |byte[] $bytes = $c.getBytes();
         |long $h = 0L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  $h = ($h * ${RollingHash.Base}L + ($bytes[$i] & 0xFF)) % ${RollingHash.P}L;
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RollingHash {
  import org.apache.spark.sql.GraftShim

  /** The single source of truth for the hash parameters: everything
    * derived from this hash (minhash seeds, simhash bits, LSH sign
    * matrices, the KMV estimator's hash-space size) references these
    * — change them here and every engine-side copy follows.
    */
  val Base = 31L
  val P = 1000000007L

  /** Driver-side twin of the Expression (for build-time constants
    * like hyperplane signs and universal-hash seeds).
    */
  def hash(s: String): Long = {
    var h = 0L
    for (b <- s.getBytes("UTF-8")) h = (h * Base + (b & 0xFF)) % P
    h
  }

  /** Column API: rolling_hash(text). */
  def rolling_hash(c: Column): Column =
    GraftShim.column(RollingHash(GraftShim.expression(c)))

  /** DuckDB twin (ASCII input, as in the testdata corpus). */
  def sql(e: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), [CAST(ascii(ch) AS BIGINT) for ch in string_split($e, '')]), (acc, x) -> (acc * $Base + x) % $P)"
}
