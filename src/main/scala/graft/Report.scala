package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** EDA summary report generator — the engine-side analog of the
  * reference's observatorio/eda.py stage, which renders descriptive
  * statistics, seasonality, and outlier findings into
  * reports/eda/eda_summary.md. Charts are a presentation concern;
  * every number in the report comes from the oracle-checked
  * operators.
  *
  * Usage: graft.Report [sfDir] [outDir]
  */
object Report {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val outDir = args.lift(1).getOrElse("target/reports")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = GraftSession.local(cpus)
    spark.sparkContext.setLogLevel("WARN")

    def q(name: String) = SparkEntry.queries(name)(spark, sfDir)

    val stats = q("kpi_quick_stats").first()
    val (meanB, stdB, maxB) =
      (stats.getDouble(0), stats.getDouble(1), stats.getDouble(2))
    val surplus = stats.getLong(3)
    val months = stats.getLong(4)

    val season = q("kpi_seasonality").collect()
    val peak = season.maxBy(_.getDouble(1)).getInt(0)
    val valley = season.minBy(_.getDouble(1)).getInt(0)

    val outliers = q("kpi_outliers").collect()
    val annual = q("kpi_annual").collect()
    val topCats = q("kpi_ranking").collect().take(3)
    val insights = q("kpi_insights_text").collect()

    val md = new StringBuilder
    md ++= "# EDA Report — graft trade analog\n\n"
    md ++= "## Descriptive statistics\n"
    md ++= f"- Mean monthly exports: $$${meanB}%.4fB USD\n"
    md ++= f"- Std deviation: $$${stdB}%.4fB USD\n"
    md ++= f"- Historical maximum: $$${maxB}%.4fB USD\n"
    md ++= f"- Surplus months: $surplus/$months (${surplus * 100.0 / months}%.1f%%)\n\n"
    md ++= "## Seasonality\n"
    md ++= s"- Peak month (avg exports): $peak\n"
    md ++= s"- Valley month: $valley\n\n"
    md ++= "## Outlier events (|MoM - mean| > 2 sigma)\n"
    outliers.foreach { r =>
      md ++= f"- ${r.getInt(0)}-${r.getInt(1)}%02d: MoM ${r.getDouble(2)}%.1f%% (z=${r.getDouble(3)}%.2f)\n"
    }
    md ++= "\n## Annual performance\n"
    md ++= "| year | export (B) | import (B) | balance (B) | export YoY |\n"
    md ++= "| --- | --- | --- | --- | --- |\n"
    annual.foreach { r =>
      val yoy = if (r.isNullAt(4)) "—" else f"${r.getDouble(4)}%.1f%%"
      md ++= f"| ${r.getInt(0)} | ${r.getDouble(1)}%.3f | ${r.getDouble(2)}%.3f | ${r.getDouble(3)}%.3f | $yoy |\n"
    }
    md ++= "\n## Top categories (1996-2000 exports)\n"
    topCats.foreach { r =>
      md ++= f"${r.getInt(0)}. ${r.getString(1)}: $$${r.getDouble(2) / 1e6}%.1fM\n"
    }
    md ++= "\n## Insights\n\n"
    insights.foreach { r =>
      md ++= r.getAs[String]("insight_md")
      md ++= "\n\n"
    }

    Files.createDirectories(Paths.get(outDir))
    Files.writeString(Paths.get(s"$outDir/eda_summary.md"), md.toString)
    println(s"report written: $outDir/eda_summary.md")
    spark.stop()
  }
}
