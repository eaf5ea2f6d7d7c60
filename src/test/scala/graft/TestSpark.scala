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

  /** Restore the GraftSession-local AQE default after a test pinned
    * it: `spark.conf.unset` reverts to Spark's BUILT-IN default
    * (true), NOT the builder's false — builder .config values land in
    * SQLConf as explicit entries, so an unset flips the shared
    * session to AQE ON for every later un-pinned plan assertion,
    * test-order dependent. Tests must restore with an explicit set.
    * (The other pinned keys — autoBroadcastJoinThreshold,
    * codegen.fallback — are NOT builder-set, so unset is correct
    * there.)
    */
  def restoreAqeDefault(): Unit =
    spark.conf.set("spark.sql.adaptive.enabled", "false")
}
