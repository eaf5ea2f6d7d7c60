package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.Row

/** Dashboard bundle generator — the engine-side analog of the
  * reference's serving layer (`app.py`, its largest file: a
  * three-tab Streamlit dashboard — app.py:126 `st.tabs` country /
  * categories / conclusions). Charts and widgets are presentation;
  * every NUMBER the dashboard serves comes from an oracle-checked
  * operator, so this main renders the full bundle those tabs consume
  * into one markdown artifact:
  *
  *   - country tab (app.py:141-398): key metrics, time series tail,
  *     seasonality, monthly distribution, QA'd detail totals
  *   - category tab (app.py:400-665): category balance + coverage,
  *     year x month heatmap, ranking, rank shifts
  *   - conclusions tab (app.py:667-807): executive summary, insight
  *     cards, quick stats, volatility
  *
  * All collects are tiny post-aggregation frames (calendar- or
  * category-bounded), the one place driver-side materialization is
  * the right call — the same shape as Report.scala's EDA stage.
  *
  * Usage: graft.Dashboard [sfDir] [outDir]
  */
object Dashboard {

  private def d(r: Row, i: Int, fmt: String = "%.3f"): String =
    if (r.isNullAt(i)) "—" else fmt.format(r.getDouble(i))
  private def i(r: Row, idx: Int): String =
    if (r.isNullAt(idx)) "—" else r.getInt(idx).toString

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val outDir = args.lift(1).getOrElse("target/reports")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = GraftSession.local(cpus)
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    Files.writeString(Paths.get(s"$outDir/dashboard.md"), render(spark, sfDir))
    println(s"dashboard written: $outDir/dashboard.md")
    spark.stop()
  }

  /** The bundle itself — separated from main so tests render against
    * the shared session without stopping it.
    */
  def render(spark: org.apache.spark.sql.SparkSession, sfDir: String): String = {
    def q(name: String) = SparkEntry.queries(name)(spark, sfDir)
    val md = new StringBuilder

    md ++= "# Trade Observatory — dashboard bundle\n\n"

    // ---- tab 1: country analysis ----
    md ++= "## Análisis por País\n\n### Métricas Clave\n"
    val ex = q("kpi_exec_summary").first()
    md ++= s"- Exportaciones ${ex.getInt(0)}: ${d(ex, 1, "%.0f")} USD\n"
    md ++= s"- Importaciones ${ex.getInt(0)}: ${d(ex, 2, "%.0f")} USD\n"
    md ++= s"- Balance: ${d(ex, 3, "%.0f")} USD\n"
    md ++= s"- Categoría líder: ${ex.getString(4)} (${d(ex, 5, "%.0f")} USD)\n\n"

    md ++= "### Serie Temporal (últimos 12 meses, MA12)\n"
    md ++= "| yr | mon | export (USD) | MA12 |\n| --- | --- | --- | --- |\n"
    q("kpi_trend").collect().takeRight(12).foreach { r =>
      md ++= s"| ${i(r, 0)} | ${i(r, 1)} | ${d(r, 2)} | ${d(r, 3)} |\n"
    }

    md ++= "\n### Estacionalidad\n"
    md ++= "| mon | avg export (USD) | avg import (USD) | n |\n| --- | --- | --- | --- |\n"
    q("kpi_seasonality").collect().foreach { r =>
      md ++= s"| ${i(r, 0)} | ${d(r, 1)} | ${d(r, 2)} | ${r.getLong(3)} |\n"
    }

    md ++= "\n### Distribución Mensual\n"
    md ++= "| mon | mean export (M) | std (M) | years |\n| --- | --- | --- | --- |\n"
    q("kpi_month_stats").collect().foreach { r =>
      md ++= s"| ${i(r, 0)} | ${d(r, 1)} | ${d(r, 2)} | ${r.getLong(3)} |\n"
    }

    md ++= "\n### Datos Detallados (reconciliación QA)\n"
    md ++= "| yr | book | lines | missing | delta |\n| --- | --- | --- | --- | --- |\n"
    q("kpi_qa_totals").collect().foreach { r =>
      md ++= s"| ${i(r, 0)} | ${d(r, 1, "%.0f")} | ${d(r, 2, "%.0f")} | ${r.getLong(3)} | ${d(r, 4, "%.0f")} |\n"
    }

    // ---- tab 2: category analysis ----
    md ++= "\n## Análisis por Categorías\n\n### Balance y Cobertura (últimos 12 meses)\n"
    md ++= "| yr | mon | balance | coverage |\n| --- | --- | --- | --- |\n"
    q("kpi_balance_cov").collect().takeRight(12).foreach { r =>
      md ++= s"| ${i(r, 0)} | ${i(r, 1)} | ${d(r, 4, "%.0f")} | ${d(r, 5, "%.2f")} |\n"
    }

    md ++= "\n### Heatmap Año × Mes (export)\n"
    val heat = q("kpi_heatmap").collect()
    if (heat.nonEmpty) {
      val years = heat.head.schema.fieldNames.drop(1)
      md ++= "| mon | " + years.mkString(" | ") + " |\n"
      md ++= "| --- |" + years.map(_ => " --- |").mkString + "\n"
      heat.foreach { r =>
        md ++= s"| ${i(r, 0)} | " + years.indices
          .map(k => d(r, k + 1, "%.2f")).mkString(" | ") + " |\n"
      }
    }

    md ++= "\n### Ranking de Categorías\n"
    md ++= "| rk | category | export | balance | coverage |\n| --- | --- | --- | --- | --- |\n"
    q("kpi_ranking").collect().foreach { r =>
      md ++= s"| ${i(r, 0)} | ${r.getString(1)} | ${d(r, 2, "%.0f")} | ${d(r, 4, "%.0f")} | ${d(r, 5, "%.2f")} |\n"
    }

    md ++= "\n### Concentración ABC (Pareto)\n"
    md ++= "| rk | category | clase | acumulado ‰ |\n| --- | --- | --- | --- |\n"
    q("kpi_pareto").collect().take(10).foreach { r =>
      md ++= s"| ${i(r, 0)} | ${r.getString(1)} | ${r.getString(5)} | ${r.getLong(4)} |\n"
    }

    md ++= "\n### Puente YoY por Categoría\n"
    q("kpi_contrib").collect().take(5).foreach { r =>
      md ++= s"- ${r.getString(0)}: Δ ${d(r, 3, "%.0f")} (${r.getLong(4)}‰, ${r.getString(5)})\n"
    }

    md ++= "\n### Tendencia OLS y Proyección\n"
    val fc = q("kpi_forecast").first()
    md ++= s"- Export: pendiente ${d(fc, 1, "%.2f")}/mes → próximo mes ${d(fc, 3, "%.0f")}\n"
    md ++= s"- Import: pendiente ${d(fc, 4, "%.2f")}/mes → próximo mes ${d(fc, 6, "%.0f")}\n"

    md ++= "\n### Cambios de Ranking\n"
    q("kpi_rank_shift").collect().takeRight(10).foreach { r =>
      val shift = if (r.isNullAt(5)) "nuevo" else f"${r.getInt(5)}%+d"
      md ++= s"- ${i(r, 0)} ${r.getString(2)}: rk ${i(r, 1)} ($shift)\n"
    }

    // ---- tab 3: conclusions ----
    md ++= "\n## Conclusiones Accionables\n\n### Resumen Ejecutivo e Insights\n"
    q("kpi_insights_text").collect().foreach { r =>
      md ++= r.getAs[String]("insight_md") + "\n\n"
    }

    md ++= "### Estadísticas Rápidas\n"
    val qs = q("kpi_quick_stats").first()
    md ++= s"- Media mensual: ${d(qs, 0, "%.4f")}B | σ: ${d(qs, 1, "%.4f")}B | máx: ${d(qs, 2, "%.4f")}B\n"
    md ++= s"- Meses con superávit: ${qs.getLong(3)}/${qs.getLong(4)}\n"
    md ++= s"- Mejor mes: ${i(qs, 5)}-${i(qs, 6)} (${d(qs, 7, "%.4f")}B)\n"
    val vol = q("kpi_volatility").first()
    md ++= s"- Volatilidad YoY: ${d(vol, 1, "%.2f")} (media YoY ${d(vol, 0, "%.2f")}, n=${vol.getLong(2)})\n"
    md.toString
  }
}
