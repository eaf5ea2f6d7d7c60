package graft.tools

import graft.{GraftSession, SparkEntry}

/** Dev harness: per-query stage census — counts Exchange / Sort /
  * Generate / Window nodes in each query's SPARK plan (planning only,
  * nothing executed) and prints a ranked table. The exchange count is
  * a direct proxy for the per-stage scheduling floor each query pays
  * at the bench SF, which is where the sub-second tail's wall time
  * lives — use it to pick the next stage-diet target.
  *
  * Caches are cleared first so the census sees the full derivation
  * plan (steady-state checkpoint scans would hide index-build
  * stages); pass --steady to census the cached shapes instead.
  */
object PlanCensus {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"), Some(sfDir))
    spark.sparkContext.setLogLevel("ERROR")
    val steady = args.contains("--steady")
    if (steady) {
      // one warm pass materializes every cached artifact
      SparkEntry.queries.foreach { case (_, fn) =>
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case _: Throwable => () }
      }
    } else graft.PlanCache.clearAll()
    // AQE's executedPlan is an empty AdaptiveSparkPlanExec shell until
    // execution — census the non-adaptive physical plan instead (same
    // exchange/sort structure AQE starts from)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val rows = SparkEntry.queries.toSeq.map { case (name, fn) =>
      try {
        val p = fn(spark, sfDir).queryExecution.executedPlan
        var ex = 0; var so = 0; var wi = 0; var ag = 0
        p.foreach {
          case _: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => ex += 1
          case _: org.apache.spark.sql.execution.SortExec => so += 1
          case _: org.apache.spark.sql.execution.window.WindowExec => wi += 1
          case _: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => ag += 1
          case _ => ()
        }
        (name, ex, so, wi, ag)
      } catch { case e: Throwable => (name, -1, -1, -1, -1) }
    }
    println(f"${"query"}%-28s ex  sort win agg")
    rows.sortBy(-_._2).foreach { case (n, e, s, w, a) =>
      println(f"$n%-28s $e%2d  $s%2d   $w%2d  $a%2d")
    }
    println(f"TOTAL exchanges: ${rows.map(_._2).filter(_ > 0).sum}")
    spark.stop()
  }
}
