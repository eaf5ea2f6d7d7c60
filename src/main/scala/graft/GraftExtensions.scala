package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import graft.functions.{ByteEnergy, ByteSum, DotProduct, RollingHash, SumSquares}
import graft.plans.{SetOpToFlagAggregate, TopKStrategy}

/** Registration of the engine's custom pieces.
  *
  * Cluster deployment path (applies at session build time):
  * ```
  * spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  * ```
  * Live-session path (e.g. notebooks, tests):
  * ```
  * GraftExtensions.install(spark)
  * ```
  * Either way, SQL users get `rolling_hash`, `dot_product`,
  * `sum_squares`, and the planner gets the TopKPerKey strategy.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectPlannerStrategy(_ => TopKStrategy)
    e.injectOptimizerRule(_ => SetOpToFlagAggregate)
    GraftExtensions.functions.foreach { case (name, builder) =>
      e.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft", name), builder))
    }
  }
}

object GraftExtensions {

  private def arity(name: String, n: Int)(
      b: Seq[Expression] => Expression): Seq[Expression] => Expression =
    exprs => {
      if (exprs.length != n) throw new IllegalArgumentException(
        s"$name expects $n argument(s), got ${exprs.length}")
      b(exprs)
    }

  val functions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "rolling_hash" -> arity("rolling_hash", 1)(exprs => RollingHash(exprs.head)),
    "dot_product" -> arity("dot_product", 2)(exprs => DotProduct(exprs(0), exprs(1))),
    "sum_squares" -> arity("sum_squares", 1)(exprs => SumSquares(exprs.head)),
    "byte_sum" -> arity("byte_sum", 1)(exprs => ByteSum(exprs.head)),
    "byte_energy" -> arity("byte_energy", 1)(exprs => ByteEnergy(exprs.head)),
    "term_counts" -> arity("term_counts", 1)(exprs =>
      graft.functions.TermCounts(exprs.head)),
    "canonical_text" -> arity("canonical_text", 1)(exprs =>
      graft.functions.CanonicalText(exprs.head)),
    "canonical_url" -> arity("canonical_url", 1)(exprs =>
      graft.functions.CanonicalUrl(exprs.head))
  )

  // install()'s functionExists idempotency check consults the SESSION
  // registry, which is pre-populated with every Spark built-in — a
  // kernel named like a built-in would silently never register and
  // SQL would run the built-in with different semantics. Fail at
  // class-load instead of at first wrong query.
  {
    val builtin = org.apache.spark.sql.catalyst.analysis.FunctionRegistry.builtin
    val clashes = functions.map(_._1)
      .filter(n => builtin.functionExists(FunctionIdentifier(n)))
    require(clashes.isEmpty,
      s"graft kernel name(s) collide with Spark built-ins: ${clashes.mkString(",")}")
  }

  /** Register on an already-running session. */
  def install(spark: SparkSession): Unit = {
    // the strategy install's synchronized check-then-append lives in
    // ONE place (TopKStrategy.installOn), shared with the lazy
    // TopKPerKey.apply path
    TopKStrategy.installOn(spark)
    // live sessions have no optimizer-injection hook; the experimental
    // extraOptimizations batch runs after the standard batches, where
    // the rule matches the lowered Distinct(semi/anti join) shapes
    spark.experimental.synchronized {
      if (!spark.experimental.extraOptimizations.contains(SetOpToFlagAggregate)) {
        spark.experimental.extraOptimizations =
          spark.experimental.extraOptimizations :+ SetOpToFlagAggregate
      }
    }
    // idempotent like the strategy/rule installs above: a session that
    // already has the functions (a prior install, or the
    // spark.sql.extensions path) is left alone — re-registering logs a
    // "replaced a previously registered function" warning per function
    // per session, which pollutes the bench log tail the driver parses
    functions.foreach { case (name, builder) =>
      if (!spark.sessionState.functionRegistry
          .functionExists(FunctionIdentifier(name))) {
        spark.sessionState.functionRegistry
          .createOrReplaceTempFunction(name, builder, "built-in")
      }
    }
  }
}
