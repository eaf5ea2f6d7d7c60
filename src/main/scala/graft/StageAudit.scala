package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Diagnostic main: per-query job/stage/task counts on the warm path.
  *
  * The bench suite is floor-bound — ~130 sub-second queries whose
  * steady-state latency is dominated by (stages × per-stage
  * scheduling floor), not data. This audit makes that term visible:
  * for each `SparkEntry.queries` entry it runs one warmup pass (JIT,
  * codegen caches, corpus artifacts — the same steady state
  * `graft.Bench` measures) and then one instrumented pass, printing
  * jobs/stages/tasks/seconds per query, sorted by stage count. A
  * query whose stage count looks too high for its plan shape is where
  * the next exchange shave lives; a query whose task count is large
  * at bench SF is over-partitioned for its volume.
  *
  * Usage mirrors Bench: SPARK_GRAFT_SF_DIR (default sf0.1),
  * SPARK_GRAFT_CPUS (default 4), optional SPARK_GRAFT_ONLY
  * (comma-separated query names to audit a subset).
  */
object StageAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").map(_.trim).toSet)
    val spark = GraftSession.local(cpus, Some(sfDir))
    spark.sparkContext.setLogLevel("WARN")

    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicLong(0L)
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        stages.incrementAndGet()
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = tasks.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)

    val selected = SparkEntry.queries.filter { case (n, _) => only.forall(_(n)) }
    def run(fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): Unit =
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()

    // warmup: steady-state caches, same as Bench's warmup pass
    selected.foreach { case (name, fn) =>
      try run(fn) catch { case e: Throwable =>
        System.err.println(s"[audit] warmup $name failed: ${e.getMessage}") }
    }

    // SPARK_GRAFT_EXPLAIN=1: dump each selected query's formatted
    // physical plan after the instrumented run (warm path, so cached
    // artifacts appear as the reused relations the bench sees)
    val explain = sys.env.get("SPARK_GRAFT_EXPLAIN").contains("1")

    val rows = selected.flatMap { case (name, fn) =>
      // drain listener events from the previous query before counting
      Thread.sleep(200) // listener bus is async (and private[spark]); settle
      jobs.set(0); stages.set(0); tasks.set(0L)
      // stderr marker so per-stage WARNs (e.g. large task binaries)
      // can be attributed to the query that scheduled them
      System.err.println(s"[audit] >>> $name")
      val t0 = System.nanoTime()
      val ok = try { run(fn); true } catch { case e: Throwable =>
        System.err.println(s"[audit] $name FAILED: ${e.getMessage}"); false }
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(200) // listener bus is async (and private[spark]); settle
      if (explain && ok) {
        println(s"==== $name ====")
        println(fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      }
      if (ok) Some((name, jobs.get(), stages.get(), tasks.get(), sec)) else None
    }.toSeq

    println(f"${"query"}%-26s ${"jobs"}%5s ${"stages"}%6s ${"tasks"}%6s ${"sec"}%7s")
    rows.sortBy { case (_, _, st, _, _) => -st }.foreach { case (n, j, st, tk, s) =>
      println(f"$n%-26s $j%5d $st%6d $tk%6d $s%7.3f")
    }
    val (tj, ts, tt) = rows.foldLeft((0, 0, 0L)) { case ((a, b, c), (_, j, st, tk, _)) =>
      (a + j, b + st, c + tk) }
    println(f"TOTAL ${rows.size} queries: $tj jobs, $ts stages, $tt tasks")
    spark.stop()
  }
}
