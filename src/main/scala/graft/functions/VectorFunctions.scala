package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Embedding math over `array<float>` columns via codegen'd
  * higher-order functions — no UDFs in the hot path.
  *
  * Determinism: per-element products are computed in double (IEEE —
  * identical on any engine), then accumulated with a *sequential
  * left fold* (`aggregate`). The DuckDB oracle mirrors the same fold
  * (`list_reduce` over a 0.0-prepended list), so the element order —
  * and therefore every intermediate rounding — is identical, making
  * dot products, norms, and cosines bit-identical across engines.
  */
object VectorFunctions {
  import org.apache.spark.sql.GraftShim.{column, expression}

  private def toD(a: Column): Column = a.cast("array<double>")

  /** Dot product (native codegen kernel, left-fold order). */
  def dot(a: Column, b: Column): Column =
    column(DotProduct(expression(toD(a)), expression(toD(b))))

  /** L2 norm (native codegen kernel). */
  def norm(a: Column): Column =
    sqrt(column(SumSquares(expression(toD(a)))))

  /** Cosine similarity of two float vectors (assumes non-zero). */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** DuckDB twins (1-indexed lists), for oracle SQL construction. */
  def dotSql(a: String, b: String, dim: Int): String =
    s"list_reduce(list_prepend(0.0, [CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE) for i in range(1, ${dim + 1})]), (acc, x) -> acc + x)"
  def normSql(a: String): String =
    s"SQRT(list_reduce(list_prepend(0.0, [CAST(x AS DOUBLE) * CAST(x AS DOUBLE) for x in $a]), (acc, x) -> acc + x))"
}
