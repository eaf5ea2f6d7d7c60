package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** Full pipeline entrypoint — the engine-side analog of the
  * reference's run_pipeline.py: ETL → KPI tables → product KPIs →
  * EDA report, each stage persisted as parquet next to a summary
  * markdown, all from the oracle-checked operators.
  *
  * Usage: graft.Pipeline [sfDir] [outDir]
  */
object Pipeline {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val outDir = args.lift(1).getOrElse("target/pipeline")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = GraftSession.local(cpus)
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))

    def stage(name: String, query: String): Unit = {
      val t0 = System.nanoTime()
      SparkEntry.queries(query)(spark, sfDir)
        .write.mode("overwrite").parquet(s"$outDir/$name")
      println(f"stage $name%-22s (${(System.nanoTime() - t0) / 1e9}%5.1f s) -> $outDir/$name")
    }

    // 1) ETL: long fact (reference etl.py → trade.parquet)
    stage("trade", "kpi_trade_long")
    // 2) KPI totals (reference metrics.py → kpi_monthly.parquet)
    stage("kpi_monthly", "kpi_mom_yoy")
    stage("kpi_ma", "kpi_ma3")
    stage("kpi_index", "kpi_idx_base")
    // 3) KPI products (reference metrics_products.py)
    stage("kpi_prod_monthly", "kpi_prod_monthly")
    // 4) QA (reference qa_report / qa_totals)
    stage("qa_totals", "kpi_qa_totals")
    // 5) EDA + insights report (reference eda.py + insights_engine.py)
    Report.main(Array(sfDir, s"$outDir/eda"))

    println(s"\npipeline complete -> $outDir")
    spark.stop()
  }
}
