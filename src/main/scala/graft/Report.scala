package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** EDA summary report generator — the engine-side analog of the
  * reference's observatorio/eda.py stage, which renders descriptive
  * statistics, seasonality, and outlier findings (plus figures) into
  * reports/. Every number comes from the oracle-checked operators;
  * the figures are dependency-free SVG (a polyline + bar chart built
  * by string assembly — eda.py's matplotlib PNGs re-expressed in the
  * one graphics format that needs no library).
  *
  * Usage: graft.Report [sfDir] [outDir]
  */
object Report {

  private def esc(s: String): String = s.flatMap {
    case '&' => "&amp;"
    case '<' => "&lt;"
    case '>' => "&gt;"
    case c => c.toString
  }

  /** Minimal line chart: points scaled into a fixed 640x240 viewBox
    * with a light axis frame and min/max labels. Deterministic bytes
    * for deterministic input.
    */
  private[graft] def lineSvg(title: String, ys: Seq[Double]): String = {
    val (w, h, pad) = (640, 240, 34)
    val lo = ys.min; val hi = ys.max
    val span = if (hi == lo) 1.0 else hi - lo
    val pts = ys.zipWithIndex.map { case (y, i) =>
      val px = pad + i.toDouble * (w - 2 * pad) / math.max(1, ys.length - 1)
      val py = h - pad - (y - lo) / span * (h - 2 * pad)
      f"$px%.1f,$py%.1f"
    }.mkString(" ")
    s"""<svg xmlns="http://www.w3.org/2000/svg" viewBox="0 0 $w $h">
       |<rect width="$w" height="$h" fill="white"/>
       |<text x="$pad" y="20" font-family="sans-serif" font-size="13">${esc(title)}</text>
       |<line x1="$pad" y1="${h - pad}" x2="${w - pad}" y2="${h - pad}" stroke="#999"/>
       |<line x1="$pad" y1="$pad" x2="$pad" y2="${h - pad}" stroke="#999"/>
       |<text x="4" y="${h - pad}" font-family="sans-serif" font-size="10">${f"$lo%.2f"}</text>
       |<text x="4" y="${pad + 4}" font-family="sans-serif" font-size="10">${f"$hi%.2f"}</text>
       |<polyline points="$pts" fill="none" stroke="#2a6fb0" stroke-width="1.5"/>
       |</svg>
       |""".stripMargin
  }

  /** Minimal bar chart over labeled values (same frame as lineSvg). */
  private[graft] def barSvg(title: String, labels: Seq[String],
      ys: Seq[Double]): String = {
    val (w, h, pad) = (640, 240, 34)
    val hi = math.max(ys.max, 0.0)
    val span = if (hi == 0.0) 1.0 else hi
    val bw = (w - 2 * pad).toDouble / ys.length
    val bars = ys.zipWithIndex.map { case (y, i) =>
      val bh = y / span * (h - 2 * pad)
      val x = pad + i * bw
      f"""<rect x="$x%.1f" y="${h - pad - bh}%.1f" width="${bw * 0.8}%.1f" height="$bh%.1f" fill="#2a6fb0"/>
         |<text x="${x + bw * 0.4}%.1f" y="${h - pad + 12}" font-family="sans-serif" font-size="9" text-anchor="middle">${esc(labels(i))}</text>""".stripMargin
    }.mkString("\n")
    s"""<svg xmlns="http://www.w3.org/2000/svg" viewBox="0 0 $w $h">
       |<rect width="$w" height="$h" fill="white"/>
       |<text x="$pad" y="20" font-family="sans-serif" font-size="13">${esc(title)}</text>
       |<line x1="$pad" y1="${h - pad}" x2="${w - pad}" y2="${h - pad}" stroke="#999"/>
       |<text x="4" y="${pad + 4}" font-family="sans-serif" font-size="10">${f"$hi%.2f"}</text>
       |$bars
       |</svg>
       |""".stripMargin
  }
  /** The EDA summary rendered from the reference's REAL data — the
    * golden-file KPI tables (byte-exact vs the reference's committed
    * parquets) instead of the TPC-H analog: eda.py's sections with
    * the actual 2005-2025 series, CUODE category names and
    * billion-dollar magnitudes. Returns (markdown, figures) where
    * each figure is (filename, svg) — the caller decides where they
    * land, so specs can render without touching disk.
    */
  def renderReference(spark: SparkSession): (String, Seq[(String, String)]) = {
    def q(name: String) = SparkEntry.queries(name)(spark, "")
    val km = q("ref_kpi_monthly").collect()
    def d(r: org.apache.spark.sql.Row, i: Int): Option[Double] =
      if (r.isNullAt(i)) None else Some(r.getDouble(i))
    val exports = km.flatMap(d(_, 3)) // export column, null-free
    val meanB = exports.sum / exports.length / 1e9
    val stdB = math.sqrt(exports.map(v => math.pow(v - exports.sum / exports.length, 2)).sum / exports.length) / 1e9
    val maxB = exports.max / 1e9
    val balances = km.flatMap(d(_, 5))
    val surplus = balances.count(_ > 0)
    // seasonality over the real calendar (month_num 1..12)
    val season = km.groupBy(_.getLong(2)).toSeq.sortBy(_._1).map {
      case (mon, rows) =>
        val vs = rows.flatMap(d(_, 3)); mon -> vs.sum / vs.length
    }
    val peak = season.maxBy(_._2)._1; val valley = season.minBy(_._2)._1
    // outliers on the real MoM series (|mom - mean| > 2 sigma)
    val moms = km.flatMap(r => d(r, 6).map(m => (r.getLong(0), r.getString(1), m)))
    val mMean = moms.map(_._3).sum / moms.length
    val mStd = math.sqrt(moms.map(x => math.pow(x._3 - mMean, 2)).sum / moms.length)
    val outliers = moms.filter(x => math.abs(x._3 - mMean) > 2 * mStd)
    val kp = q("ref_kpi_prod_monthly").collect()
    val lastYr = kp.iterator.map(_.getLong(0)).max
    val topCats = kp.iterator.filter(_.getLong(0) == lastYr)
      .toSeq.groupBy(_.getString(3))
      .view.mapValues(_.flatMap(d(_, 4)).sum).toSeq
      .filter(_._2 > 0).sortBy { case (c, e) => (-e, c) }.take(3)

    val md = new StringBuilder
    md ++= "# EDA Report — Observatorio de Comercio (datos reales)\n\n"
    md ++= "## Descriptive statistics (exports, 2005-2025)\n"
    md ++= f"- Mean monthly exports: $$${meanB}%.4fB USD\n"
    md ++= f"- Std deviation: $$${stdB}%.4fB USD\n"
    md ++= f"- Historical maximum: $$${maxB}%.4fB USD\n"
    md ++= f"- Surplus months: $surplus/${balances.length} (balance known through 2024)\n\n"
    md ++= "## Seasonality\n"
    md ++= s"- Peak month (avg exports): $peak\n- Valley month: $valley\n\n"
    md ++= "## Outlier events (|MoM - mean| > 2 sigma)\n"
    outliers.foreach { case (yr, mes, mom) =>
      md ++= f"- $yr-$mes: MoM $mom%.1f%%\n"
    }
    md ++= s"\n## Top export categories ($lastYr)\n"
    topCats.zipWithIndex.foreach { case ((cat, v), k) =>
      md ++= f"${k + 1}. $cat: $$${v / 1e9}%.2fB\n"
    }
    val figures = Seq(
      "eda_trend_ref.svg" ->
        lineSvg("Monthly exports 2005-2025 (USD)", exports.toSeq),
      "eda_seasonality_ref.svg" ->
        barSvg("Avg exports by month (USD)",
          season.map(_._1.toString), season.map(_._2)))
    (md.toString, figures)
  }

  /** The reference's committed `reports/eda/eda_summary.md`,
    * re-rendered byte-for-byte from the oracle-checked
    * `ref_eda_stats` query — the FIFTH golden file's adjudication
    * surface (eda.py:264-296's template; the interpolated values are
    * the nine statistics, everything else is the template's fixed
    * narrative text, reproduced as a semantic necessity — byte
    * parity to a published report requires the report's own
    * format). Every line except the trailing generation timestamp
    * reproduces the committed file exactly; InsightsSpec pins that
    * line-by-line against `/root/reference/reports/eda/
    * eda_summary.md`. Formatting note: Python's `{:.1f}` rounds
    * half-even, Java's `%.1f` half-up — equal everywhere off a
    * .x5 tie, and the spec proves none of the five formatted values
    * sits on one.
    *
    * `now` is injectable so specs render deterministically.
    */
  def renderEdaSummaryGolden(spark: SparkSession,
      now: java.time.LocalDateTime = java.time.LocalDateTime.now()): String = {
    val r = SparkEntry.queries("ref_eda_stats")(spark, "").collect().head
    val meanS = f"${r.getDouble(0)}%.1f"
    val stdS = f"${r.getDouble(1)}%.1f"
    val maxS = f"${r.getDouble(2) / 1e9}%.1f"
    val maxYm = r.getString(3)
    val surplus = r.getLong(4); val total = r.getLong(5)
    val pctS = f"${surplus.toDouble / total * 100.0}%.1f"
    val peak = r.getString(6); val valley = r.getString(7)
    val outliers = r.getLong(8)
    val ts = now.format(
      java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss"))
    s"""# Reporte EDA - Observatorio de Comercio Perú
       |
       |## 📊 Estadísticas Generales
       |- **Exportaciones promedio**: $$${meanS}B USD
       |- **Desviación estándar**: $$${stdS}B USD
       |- **Máximo histórico**: $$${maxS}B USD ($maxYm)
       |- **Meses con superávit**: $surplus/$total ($pctS%)
       |
       |## 🗓️ Patrones Estacionales
       |- **Mes pico**: $peak (mayor promedio de exportaciones)
       |- **Mes valle**: $valley (menor promedio de exportaciones)
       |
       |## 🔍 Eventos Atípicos
       |- **Outliers detectados**: $outliers eventos
       |- **Criterio**: Variaciones >2σ respecto a la media
       |
       |## 📈 Hallazgos Clave
       |1. **Tendencia general**: Crecimiento sostenido con volatilidad cíclica
       |2. **Estacionalidad**: Patrones regulares con picos en $peak
       |3. **Volatilidad**: Mayor inestabilidad en períodos 2008-2009, 2020-2021
       |4. **Balance comercial**: Alternancia entre superávit y déficit según coyuntura
       |
       |## 📋 Archivos Generados
       |- `series_temporal.html`: Serie temporal principal
       |- `estacionalidad_heatmap.html`: Mapa de calor estacional
       |- `distribucion_mensual.html`: Distribución por meses
       |- `tendencias.html`: Análisis de tendencias
       |- `outliers.html`: Detección de eventos atípicos
       |- `dashboard_eda.html`: Dashboard resumen
       |
       |*Generado el $ts*
       |""".stripMargin
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val outDir = args.lift(1).getOrElse("target/reports")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = GraftSession.local(cpus, Some(sfDir))
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

    // figures (eda.py renders charts into reports/; here as SVG):
    // monthly export series + seasonality profile, both from the
    // same oracle-checked frames the tables above already used
    val trend = q("kpi_trend").collect().filter(!_.isNullAt(2))
    Files.writeString(Paths.get(s"$outDir/eda_trend.svg"),
      lineSvg("Monthly exports (USD)", trend.map(_.getDouble(2)).toSeq))
    Files.writeString(Paths.get(s"$outDir/eda_seasonality.svg"),
      barSvg("Avg exports by month (USD)",
        season.map(_.getInt(0).toString).toSeq,
        season.map(_.getDouble(1)).toSeq))
    // the drop-in replacement for the reference's committed report:
    // same filename the reference publishes under reports/eda/, in
    // its exact format, from the real data
    Files.writeString(Paths.get(s"$outDir/eda_summary_reference.md"),
      renderEdaSummaryGolden(spark))
    println(s"report written: $outDir/eda_summary.md (+2 SVG figures, " +
      "+eda_summary_reference.md)")
    spark.stop()
  }
}
