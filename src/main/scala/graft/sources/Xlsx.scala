package graft.sources

import java.io.{ByteArrayInputStream, OutputStream}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.{ZipEntry, ZipInputStream, ZipOutputStream}
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Minimal Office-Open-XML (.xlsx) boundary — reference
  * `observatorio/etl.py:20-33` ingests its trade books with
  * `pd.read_excel`, so the engine must cross a REAL xlsx file
  * boundary, not only CSV. No spreadsheet library resolves in this
  * offline build, and none is needed: an xlsx is a zip of small XML
  * parts (ECMA-376), and the JDK ships both the zip codec and a StAX
  * pull parser. This module implements exactly the subset the trade
  * books use — one sheet, inline strings — which is also the subset
  * the reference's parse actually consumes (pandas reads cells as
  * strings/objects and etl.py re-parses them).
  *
  * Scale shape: the READ side is a `binaryFile` scan + per-partition
  * decode (the same typed-binary pattern as the multimodal decode
  * stages) — one task per workbook, so a 100 TB lake of many books
  * parallelizes over files. A single workbook is calendar-bounded by
  * construction (the reference's books are year × month grids), so
  * per-file decode state is tiny.
  */
object Xlsx {

  private def xmlEscape(s: String): String =
    s.flatMap {
      case '&' => "&amp;"
      case '<' => "&lt;"
      case '>' => "&gt;"
      case '"' => "&quot;"
      case c => c.toString
    }

  /** Write `rows` (first row = header) as a one-sheet workbook with
    * inline-string cells. Deterministic bytes for deterministic rows:
    * fixed entry order, no timestamps in the XML parts (zip entry
    * times are set to a fixed epoch so reruns produce identical
    * files).
    */
  def writeWorkbook(out: OutputStream, rows: Seq[Seq[String]],
      sheetName: String = "Sheet1"): Unit = {
    val zip = new ZipOutputStream(out, UTF_8)
    def part(name: String, body: String): Unit = {
      val e = new ZipEntry(name)
      e.setTime(0L)
      zip.putNextEntry(e)
      zip.write(body.getBytes(UTF_8))
      zip.closeEntry()
    }
    part("[Content_Types].xml",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
        |<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
        |<Default Extension="xml" ContentType="application/xml"/>
        |<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
        |<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
        |</Types>""".stripMargin)
    part("_rels/.rels",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
        |</Relationships>""".stripMargin)
    part("xl/workbook.xml",
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
         |<sheets><sheet name="${xmlEscape(sheetName)}" sheetId="1" r:id="rId1"/></sheets>
         |</workbook>""".stripMargin)
    part("xl/_rels/workbook.xml.rels",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
        |</Relationships>""".stripMargin)
    val sheetRows = rows.zipWithIndex.map { case (cells, i) =>
      cells.map(c =>
        s"""<c t="inlineStr"><is><t>${xmlEscape(c)}</t></is></c>""")
        .mkString(s"""<row r="${i + 1}">""", "", "</row>")
    }.mkString("\n")
    part("xl/worksheets/sheet1.xml",
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
         |<sheetData>
         |$sheetRows
         |</sheetData>
         |</worksheet>""".stripMargin)
    zip.finish()
  }

  /** Decode one workbook's first sheet from its zip bytes into rows
    * of string cells. Handles inline strings (`t="inlineStr"`) and
    * raw `<v>` values — the cell kinds the books contain. Runs on
    * executors (pure JDK, serializable-free static call).
    */
  def parseSheet(bytes: Array[Byte]): Seq[Seq[String]] = {
    val zin = new ZipInputStream(new ByteArrayInputStream(bytes), UTF_8)
    try {
      Iterator.continually(zin.getNextEntry)
        .takeWhile(_ != null)
        .find(_.getName == "xl/worksheets/sheet1.xml")
        .map { _ =>
          val fac = XMLInputFactory.newInstance()
          // hygiene for untrusted workbook XML: no DTDs, no externals
          fac.setProperty(XMLInputFactory.SUPPORT_DTD, false)
          fac.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
          val r = fac.createXMLStreamReader(zin)
          val rows = Seq.newBuilder[Seq[String]]
          var row: scala.collection.mutable.Builder[String, Seq[String]] = null
          var cell: StringBuilder = null
          var inText = false
          while (r.hasNext) {
            r.next() match {
              case XMLStreamConstants.START_ELEMENT =>
                r.getLocalName match {
                  case "row" => row = Seq.newBuilder[String]
                  case "c" => cell = new StringBuilder
                  case "t" | "v" => inText = true
                  case _ => ()
                }
              case XMLStreamConstants.CHARACTERS if inText =>
                if (cell != null) cell.append(r.getText)
              case XMLStreamConstants.END_ELEMENT =>
                r.getLocalName match {
                  case "row" => if (row != null) { rows += row.result(); row = null }
                  case "c" =>
                    if (row != null && cell != null) row += cell.toString
                    cell = null
                  case "t" | "v" => inText = false
                  case _ => ()
                }
              case _ => ()
            }
          }
          r.close()
          rows.result()
        }
        .getOrElse(Seq.empty)
    } finally zin.close()
  }

  /** Read workbooks under `pathGlob` as (book, row_num, cells) — a
    * `binaryFile` scan decoded per partition, one decode per file, so
    * many books scale out over tasks exactly like the multimodal
    * binary stages.
    */
  def readSheets(spark: SparkSession, pathGlob: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.xlsx")
      .load(pathGlob)
      .select($"path", $"content")
      .as[(String, Array[Byte])]
      .flatMap { case (p, bytes) =>
        parseSheet(bytes).zipWithIndex.map { case (cells, i) =>
          (p, i + 1, cells)
        }
      }
      .toDF("book", "row_num", "cells")
  }
}
