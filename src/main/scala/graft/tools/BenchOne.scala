package graft.tools

import graft.{GraftSession, SparkEntry}

/** Dev harness: bench a subset of SparkEntry queries by name
  * (args = query names; no args = list available names). Same
  * measurement discipline as Bench (noop sink, warmup pass, min of 2
  * measured passes) so per-query figures are comparable, without
  * paying the full-suite wall time while iterating on one operator.
  */
object BenchOne {
  def main(rawArgs: Array[String]): Unit = {
    // tools/run_verify.sh always prepends sfDir/outDir positionals;
    // callers pass the literal "ignored" there — drop them
    val args = rawArgs.dropWhile(_ == "ignored")
    if (args.isEmpty) {
      SparkEntry.queries.keys.toSeq.sorted.foreach(println)
      return
    }
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.local(cpus, Some(sfDir))
    spark.sparkContext.setLogLevel("WARN")
    if (args.head == "--explain") {
      args.tail.foreach { name =>
        println(s"==== $name ====")
        SparkEntry.queries(name)(spark, sfDir).explain("formatted")
      }
      spark.stop()
      return
    }
    def run(name: String): Double = {
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    args.foreach { name =>
      val warm = run(name)
      val m = math.min(run(name), run(name))
      println(f"$name%-28s warm=$warm%6.3f  min2=$m%6.3f s")
    }
    spark.stop()
  }
}
