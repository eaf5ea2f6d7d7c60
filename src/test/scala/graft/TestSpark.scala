package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites (Spark startup dominates
  * test wall-clock otherwise).
  */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = GraftSession.builder("4").appName("graft-test").getOrCreate()
    GraftExtensions.install(s) // same surface GraftSession.local ships
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sf: String = "/root/testdata/sf0.001"
}
