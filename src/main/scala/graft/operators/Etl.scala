package graft.operators

import graft.{Det, Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The raw-source parsing stage the reference pipeline runs FIRST —
  * `observatorio/etl.py:20-58 parse_book`: workbook sheets whose rows
  * carry Spanish month-name labels (`Enero` … `Diciembre`,
  * etl.py:11-14) plus a `Total` QA row per year/flow (etl.py:54-58),
  * with arbitrary cell junk that must parse to NULL, reshaped into
  * the long fact `(year, month, flow, usd)` and reconciled
  * (etl.py:61-76 qa_report: book total vs sum of months).
  *
  * The container has no spreadsheet source, so the raw stage is a
  * deterministic in-plan facsimile built from `orders`: month-name
  * rows rendered as STRINGS (integer-dollar cells so the rendering is
  * engine-exact), one deliberately malformed cell (`'n.d.'` — the
  * kind of footnote junk real sheets contain) and one deliberately
  * wrong `Total` (book total ≠ sum of months). The PARSE stage below
  * treats those rows as opaque text: month-name → month-number
  * mapping, TRY_CAST for malformed cells, QA-row separation and
  * reconciliation — exactly the work parse_book does. Both engines
  * build the identical raw rows, so the parse semantics are
  * oracle-checked end to end.
  *
  * Scale shape: the parse is a narrow projection (CASE map + try
  * cast) over the raw rows; the QA reconciliation aggregates to the
  * (year, flow) grain — a calendar-bounded table — before the join
  * back, so nothing here grows super-linearly with input size.
  */
object Etl {

  /** Spanish month names, in month order (etl.py:11-14 MONTHS). */
  private val meses = Seq(
    "Enero", "Febrero", "Marzo", "Abril", "Mayo", "Junio",
    "Julio", "Agosto", "Septiembre", "Octubre", "Noviembre", "Diciembre")

  // the two planted defects, shared by both engines: a malformed
  // month cell (parses to NULL, drops out of the month sum → QA
  // mismatch for that year/flow) and a corrupted book total
  private val badCell = (1997, "export", 2) // (year, flow, month) → 'n.d.'
  private val badTotal = (1998, "import", 999L) // book total off by +999

  /** mes-label → month-number as an explicit CASE (not
    * array_position/list_position, whose not-found semantics differ
    * across engines); unknown labels map to NULL.
    */
  private def mesToMon(c: Column): Column =
    meses.zipWithIndex.foldLeft(lit(null).cast("int")) {
      case (acc, (m, i)) => when(c === m, lit(i + 1)).otherwise(acc)
    }
  private def mesToMonSql(e: String): String =
    meses.zipWithIndex
      .map { case (m, i) => s"WHEN '$m' THEN ${i + 1}" }
      .mkString(s"CASE $e ", " ", " END")

  /** month-number → mes-label (raw-stage rendering direction). */
  private def monToMesSql(e: String): String =
    meses.zipWithIndex
      .map { case (m, i) => s"WHEN ${i + 1} THEN '$m'" }
      .mkString(s"CASE $e ", " ", " END")

  /** The raw "workbook": (yr, flow, mes, val) string rows — 12
    * month-name rows plus one 'Total' row per year/flow.
    */
  private def rawBook(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val m = Tables(spark, dir).orders
      .select(year($"o_orderdate").as("yr"),
        when($"o_orderstatus" === "F", "export").otherwise("import").as("flow"),
        month($"o_orderdate").as("mon"), $"o_totalprice")
      .groupBy($"yr", $"flow", $"mon")
      // integer dollars: floor(+) == trunc on both engines, and a
      // BIGINT renders to the identical string everywhere (double
      // rendering differs engine to engine — never stringify doubles)
      .agg(floor(Det.dsum($"o_totalprice")).cast("long").as("usd_i"))
    val monthRows = m.select($"yr", $"flow",
      element_at(array(meses.map(lit): _*), $"mon").as("mes"),
      when($"yr" === badCell._1 && $"flow" === badCell._2 && $"mon" === badCell._3,
        lit("n.d."))
        .otherwise($"usd_i".cast("string")).as("val"))
    val totalRows = m.groupBy($"yr", $"flow")
      .agg(sum($"usd_i").as("tot"))
      .select($"yr", $"flow", lit("Total").as("mes"),
        ($"tot" + when($"yr" === badTotal._1 && $"flow" === badTotal._2,
          lit(badTotal._3)).otherwise(lit(0L))).cast("string").as("val"))
    monthRows.unionAll(totalRows)
  }

  /** parse_book re-expressed: month rows → (yr, mon, flow, usd) with
    * malformed cells as NULL; Total rows separated for QA; qa_ok per
    * (yr, flow) = book total equals the recomputed month sum.
    */
  private def etlParse(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val raw = rawBook(spark, dir)
    val parsed = raw.filter($"mes" =!= "Total")
      .select($"yr", $"flow", mesToMon($"mes").as("mon"),
        expr("TRY_CAST(val AS BIGINT)").as("usd"))
    val totals = raw.filter($"mes" === "Total")
      .select($"yr", $"flow", expr("TRY_CAST(val AS BIGINT)").as("book_total"))
    val qa = parsed.groupBy($"yr", $"flow")
      .agg(sum($"usd").as("sum_months"))
    parsed
      .join(totals, Seq("yr", "flow"))
      .join(qa, Seq("yr", "flow"))
      .select($"yr", $"mon", $"flow", $"usd",
        ($"sum_months" === $"book_total").as("qa_ok"))
      .orderBy($"yr", $"mon", $"flow")
  }

  private val etlParseSql =
    s"""WITH m AS (
       |  SELECT CAST(year(o_orderdate) AS INTEGER) AS yr,
       |    CASE WHEN o_orderstatus = 'F' THEN 'export' ELSE 'import' END AS flow,
       |    CAST(month(o_orderdate) AS INTEGER) AS mon,
       |    CAST(trunc(${Det.dsumSql("o_totalprice")}) AS BIGINT) AS usd_i
       |  FROM orders GROUP BY yr, flow, mon),
       |mrows AS (
       |  SELECT yr, flow,
       |    ${monToMesSql("mon")} AS mes,
       |    CASE WHEN yr = ${badCell._1} AND flow = '${badCell._2}' AND mon = ${badCell._3}
       |         THEN 'n.d.' ELSE CAST(usd_i AS VARCHAR) END AS val
       |  FROM m),
       |trows AS (
       |  SELECT yr, flow, 'Total' AS mes,
       |    CAST(SUM(usd_i) + CASE WHEN yr = ${badTotal._1} AND flow = '${badTotal._2}'
       |                           THEN ${badTotal._3} ELSE 0 END AS VARCHAR) AS val
       |  FROM m GROUP BY yr, flow),
       |raw AS (SELECT * FROM mrows UNION ALL SELECT * FROM trows),
       |parsed AS (
       |  SELECT yr, flow, ${mesToMonSql("mes")} AS mon,
       |    TRY_CAST(val AS BIGINT) AS usd
       |  FROM raw WHERE mes <> 'Total'),
       |totals AS (
       |  SELECT yr, flow, TRY_CAST(val AS BIGINT) AS book_total
       |  FROM raw WHERE mes = 'Total'),
       |qa AS (SELECT yr, flow, SUM(usd) AS sum_months FROM parsed GROUP BY yr, flow)
       |SELECT p.yr, p.mon, p.flow, p.usd,
       |  (q.sum_months = t.book_total) AS qa_ok
       |FROM parsed p
       |JOIN totals t ON t.yr = p.yr AND t.flow = p.flow
       |JOIN qa q ON q.yr = p.yr AND q.flow = p.flow
       |ORDER BY p.yr, p.mon, p.flow""".stripMargin

  val all: Seq[Q] = Seq(
    Q("etl_parse", etlParse, Some(etlParseSql))
  )
}
