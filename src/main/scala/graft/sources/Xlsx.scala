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
  * pull parser. This module implements the subset the trade books
  * use: MULTI-sheet workbooks (the reference's product books carry
  * one sheet PER YEAR plus note sheets —
  * `observatorio/etl_products.py:28-33` iterates `xls.sheet_names`
  * over `data/cdro_F1.xlsx`), inline-string cells, shared-string
  * cells (`t="s"` resolved through `xl/sharedStrings.xml`, incl.
  * rich-text runs), bare numeric `<v>` values, and both dense writer
  * output and Excel's sparse `r="B2"` addressing — the cell kinds the
  * reference's REAL Excel-written books contain (XlsxSpec drives
  * data/cdro_F1+G1.xlsx end to end). Number FORMATS are still out of
  * scope: every cell surfaces as its raw string, because pandas reads
  * the reference's cells as strings/objects and the etl re-parses
  * them, which is exactly what the downstream parse stages here do
  * too.
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

  /** Write `rows` (first row = header) as a one-sheet workbook —
    * the single-sheet convenience over [[writeWorkbookSheets]].
    */
  def writeWorkbook(out: OutputStream, rows: Seq[Seq[String]],
      sheetName: String = "Sheet1"): Unit =
    writeWorkbookSheets(out, Seq(sheetName -> rows))

  /** Write a MULTI-sheet workbook with inline-string cells — the
    * reference's product-book layout is one sheet per year
    * (etl_products.py:28-33). Deterministic bytes for deterministic
    * rows: fixed entry order, no timestamps in the XML parts (zip
    * entry times are set to a fixed epoch so reruns produce identical
    * files).
    */
  def writeWorkbookSheets(out: OutputStream,
      sheets: Seq[(String, Seq[Seq[String]])]): Unit = {
    require(sheets.nonEmpty, "a workbook needs at least one sheet")
    val zip = new ZipOutputStream(out, UTF_8)
    def part(name: String, body: String): Unit = {
      val e = new ZipEntry(name)
      e.setTime(0L)
      zip.putNextEntry(e)
      zip.write(body.getBytes(UTF_8))
      zip.closeEntry()
    }
    val ids = sheets.indices.map(_ + 1)
    part("[Content_Types].xml",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
        |<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
        |<Default Extension="xml" ContentType="application/xml"/>
        |<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
        |""".stripMargin +
        ids.map(i =>
          s"""<Override PartName="/xl/worksheets/sheet$i.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>""")
          .mkString("\n") +
        "\n</Types>")
    part("_rels/.rels",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
        |</Relationships>""".stripMargin)
    part("xl/workbook.xml",
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
         |<sheets>""".stripMargin +
        sheets.zip(ids).map { case ((name, _), i) =>
          s"""<sheet name="${xmlEscape(name)}" sheetId="$i" r:id="rId$i"/>"""
        }.mkString +
        "</sheets>\n</workbook>")
    part("xl/_rels/workbook.xml.rels",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |""".stripMargin +
        ids.map(i =>
          s"""<Relationship Id="rId$i" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet$i.xml"/>""")
          .mkString("\n") +
        "\n</Relationships>")
    sheets.zip(ids).foreach { case ((_, rows), i) =>
      val sheetRows = rows.zipWithIndex.map { case (cells, r) =>
        cells.map(c =>
          s"""<c t="inlineStr"><is><t>${xmlEscape(c)}</t></is></c>""")
          .mkString(s"""<row r="${r + 1}">""", "", "</row>")
      }.mkString("\n")
      part(s"xl/worksheets/sheet$i.xml",
        s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
           |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
           |<sheetData>
           |$sheetRows
           |</sheetData>
           |</worksheet>""".stripMargin)
    }
    zip.finish()
  }

  /** Hardened StAX factory for untrusted workbook XML: no DTDs, no
    * external entities.
    */
  private def secureFactory(): XMLInputFactory = {
    val fac = XMLInputFactory.newInstance()
    fac.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    fac.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    fac
  }

  /** Attribute by LOCAL name, namespace-agnostic: `r:id` lives in the
    * relationships namespace while `name` has none — matching on
    * local name handles both without hardcoding namespace URIs.
    */
  private def attr(r: javax.xml.stream.XMLStreamReader, local: String): Option[String] =
    (0 until r.getAttributeCount)
      .find(i => r.getAttributeLocalName(i) == local)
      .map(r.getAttributeValue)

  /** Column index (0-based) from an `r="BC7"`-style cell reference's
    * letter prefix; None when the ref carries no letters.
    */
  private[sources] def colOfRef(ref: String): Option[Int] = {
    var c = 0; var i = 0
    while (i < ref.length && ref.charAt(i) >= 'A' && ref.charAt(i) <= 'Z') {
      c = c * 26 + (ref.charAt(i) - 'A' + 1); i += 1
    }
    if (i == 0) None else Some(c - 1)
  }

  /** Parse one worksheet part's XML into a dense grid of string
    * cells. Handles the cell kinds REAL books contain (verified
    * against the reference's Excel-written cdro_F1/G1 books):
    * `t="inlineStr"` inline text, `t="s"` shared-string references
    * resolved through `shared`, and bare/numeric `<v>` values; both
    * dense writer output (no `r=` attributes — positional) and
    * Excel's sparse `r="B2"` addressing (skipped rows/columns become
    * `""` cells, the positional equivalent of pandas' NaN — the
    * downstream parse rules treat both as skippable). Styled-empty
    * cells (`<c r="A1" s="17"/>`) contribute `""`.
    */
  private def parseSheetXml(in: java.io.InputStream,
      shared: IndexedSeq[String]): Seq[Seq[String]] = {
    val r = secureFactory().createXMLStreamReader(in)
    val rows = scala.collection.mutable.ArrayBuffer[
      scala.collection.mutable.ArrayBuffer[String]]()
    var row: scala.collection.mutable.ArrayBuffer[String] = null
    var cell: StringBuilder = null
    var cellType: String = null
    var cellCol = -1 // from r="B2" when present, else sequential
    var nextCol = 0
    var inV = false; var inIs = false; var inT = false
    def put(col: Int, v: String): Unit = {
      while (row.length <= col) row += ""
      row(col) = v
    }
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "row" =>
              // rows may skip indexes (r= is 1-based); pad with empties
              val idx = attr(r, "r").flatMap(_.toIntOption)
                .map(_ - 1).getOrElse(rows.length)
              while (rows.length < idx)
                rows += scala.collection.mutable.ArrayBuffer[String]()
              row = scala.collection.mutable.ArrayBuffer[String]()
              rows += row
              nextCol = 0
            case "c" =>
              cell = new StringBuilder
              cellType = attr(r, "t").getOrElse("")
              cellCol = attr(r, "r").flatMap(colOfRef).getOrElse(nextCol)
            case "v" => inV = true
            case "is" => inIs = true
            case "t" => inT = true
            case _ => ()
          }
        case XMLStreamConstants.CHARACTERS if (inV || (inIs && inT)) =>
          if (cell != null) cell.append(r.getText)
        case XMLStreamConstants.END_ELEMENT =>
          r.getLocalName match {
            case "row" => row = null
            case "c" =>
              if (row != null && cell != null) {
                val raw = cell.toString
                val v =
                  if (cellType == "s")
                    raw.toIntOption.filter(shared.indices.contains)
                      .map(shared).getOrElse(raw)
                  else raw // inlineStr text, str/n/b/e raw value
                put(cellCol, v)
                nextCol = cellCol + 1
              }
              cell = null; cellType = null; cellCol = -1
            case "v" => inV = false
            case "is" => inIs = false
            case "t" => inT = false
            case _ => ()
          }
        case _ => ()
      }
    }
    r.close()
    rows.map(_.toSeq).toSeq
  }

  /** The shared-string table (`xl/sharedStrings.xml`): one entry per
    * `<si>`, concatenating every `<t>` run inside it (plain and
    * rich-text items both).
    */
  private def parseSharedStrings(bytes: Array[Byte]): IndexedSeq[String] = {
    val r = secureFactory().createXMLStreamReader(new ByteArrayInputStream(bytes))
    val out = IndexedSeq.newBuilder[String]
    var cur: StringBuilder = null
    var inT = false
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "si" => cur = new StringBuilder
            case "t" => inT = true
            case _ => ()
          }
        case XMLStreamConstants.CHARACTERS if inT =>
          if (cur != null) cur.append(r.getText)
        case XMLStreamConstants.END_ELEMENT =>
          r.getLocalName match {
            case "si" => if (cur != null) { out += cur.toString; cur = null }
            case "t" => inT = false
            case _ => ()
          }
        case _ => ()
      }
    }
    r.close()
    out.result()
  }

  /** Decode EVERY sheet of a workbook from its zip bytes, in workbook
    * order, as (sheetName, rows) — the reference's product books are
    * one sheet per year plus note sheets (etl_products.py:28-33), so
    * the decode must surface names for the year filter downstream.
    * Sheet names come from `xl/workbook.xml` and resolve to worksheet
    * parts through `xl/_rels/workbook.xml.rels` (the r:id indirection
    * real writers use — sheet order and part numbering need not
    * agree). Runs on executors (pure JDK, serializable-free static
    * call); a whole book is held in memory, which is safe because
    * books are calendar-bounded grids, not data lakes.
    */
  def parseWorkbook(bytes: Array[Byte]): Seq[(String, Seq[Seq[String]])] = {
    val parts = scala.collection.mutable.Map[String, Array[Byte]]()
    val zin = new ZipInputStream(new ByteArrayInputStream(bytes), UTF_8)
    try Iterator.continually(zin.getNextEntry).takeWhile(_ != null).foreach { e =>
      val n = e.getName
      if (n == "xl/workbook.xml" || n == "xl/_rels/workbook.xml.rels" ||
          n == "xl/sharedStrings.xml" ||
          (n.startsWith("xl/worksheets/") && n.endsWith(".xml")))
        parts(n) = zin.readAllBytes()
    } finally zin.close()
    val shared = parts.get("xl/sharedStrings.xml")
      .map(parseSharedStrings).getOrElse(IndexedSeq.empty)
    val rels: Map[String, String] =
      parts.get("xl/_rels/workbook.xml.rels").map { b =>
        val r = secureFactory().createXMLStreamReader(new ByteArrayInputStream(b))
        val m = Map.newBuilder[String, String]
        while (r.hasNext) {
          if (r.next() == XMLStreamConstants.START_ELEMENT &&
              r.getLocalName == "Relationship")
            for (id <- attr(r, "Id"); t <- attr(r, "Target")) m += id -> t
        }
        r.close()
        m.result()
      }.getOrElse(Map.empty)
    val sheetMeta: Seq[(String, String)] =
      parts.get("xl/workbook.xml").map { b =>
        val r = secureFactory().createXMLStreamReader(new ByteArrayInputStream(b))
        val s = Seq.newBuilder[(String, String)]
        while (r.hasNext) {
          if (r.next() == XMLStreamConstants.START_ELEMENT &&
              r.getLocalName == "sheet")
            for (n <- attr(r, "name"); id <- attr(r, "id")) s += n -> id
        }
        r.close()
        s.result()
      }.getOrElse(Seq.empty)
    sheetMeta.flatMap { case (name, rid) =>
      rels.get(rid).map { target =>
        // targets are workbook-relative ("worksheets/sheet2.xml") or
        // package-absolute ("/xl/worksheets/sheet2.xml")
        val part = if (target.startsWith("/")) target.drop(1) else s"xl/$target"
        name -> parts.get(part)
          .map(b => parseSheetXml(new ByteArrayInputStream(b), shared))
          .getOrElse(Seq.empty)
      }
    }
  }

  /** Decode one workbook's FIRST sheet — the single-sheet trade-book
    * path (etl_parse_xlsx); product books go through [[parseWorkbook]].
    */
  def parseSheet(bytes: Array[Byte]): Seq[Seq[String]] =
    parseWorkbook(bytes).headOption.map(_._2).getOrElse(Seq.empty)

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

  /** Read EVERY sheet of every workbook under `pathGlob` as one cell
    * per output row: (book, sheet, row_num, col_num, val). Row and
    * column numbers are 0-BASED to mirror the pandas `.iat[r, c]`
    * coordinates the reference's parse logic is written in
    * (etl_products.py:47,63). Same scale shape as [[readSheets]]: a
    * binaryFile scan, one decode task per workbook.
    *
    * Failure contract (strict, parity-grade): a malformed zip THROWS
    * and fails the job — on the reference's curated inputs a corrupt
    * book is a stop-the-pipeline event, exactly as pd.read_excel
    * raises. For lake-scale ingest where one bad file in a million
    * must not kill the scan, use [[readAllCellsTolerant]].
    */
  def readAllCells(spark: SparkSession, pathGlob: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.xlsx")
      .load(pathGlob)
      .select($"path", $"content")
      .as[(String, Array[Byte])]
      .flatMap { case (p, bytes) =>
        parseWorkbook(bytes).flatMap { case (sheet, rows) =>
          rows.zipWithIndex.flatMap { case (cells, r) =>
            cells.zipWithIndex.map { case (v, c) => (p, sheet, r, c, v) }
          }
        }
      }
      .toDF("book", "sheet", "row_num", "col_num", "val")
  }

  /** Lake-scale variant of [[readAllCells]]: per-book decode failures
    * become QUARANTINE rows instead of task failures, so one
    * truncated upload in a million-book lake cannot kill the scan.
    * Adds a `decode_error` column — null on good cells; on a bad book
    * a single row carries the error (sheet = "", coordinates -1) for
    * a quarantine sink to collect. Two failure classes surface:
    * thrown decode errors (truncated/corrupt zip, malformed XML) and
    * the silent one — bytes that unzip to NO worksheet parts (e.g. a
    * renamed non-xlsx file), which the strict reader would drop as
    * zero rows with no signal. Scale shape unchanged: one decode task
    * per book; the error branch allocates one row.
    *
    * Unlike the strict readers (parity-grade, curated FLAT inputs),
    * this one descends nested directories (`recursiveFileLookup`): a
    * lake's layout is rarely flat, and the zero-byte quarantine pass
    * below must cover exactly the file set the decoder lists — both
    * are recursive, spec-pinned on a two-level layout.
    */
  def readAllCellsTolerant(spark: SparkSession, pathGlob: String): DataFrame = {
    import spark.implicits._
    val decoded = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.xlsx")
      .option("recursiveFileLookup", "true")
      .load(pathGlob)
      .select($"path", $"content")
      .as[(String, Array[Byte])]
      .flatMap { case (p, bytes) =>
        def quarantine(msg: String) = Seq((p, "", -1, -1, "", msg))
        try {
          val sheets = parseWorkbook(bytes)
          if (sheets.isEmpty)
            quarantine("no worksheets decoded (not an xlsx workbook?)")
          else sheets.flatMap { case (sheet, rows) =>
            rows.zipWithIndex.flatMap { case (cells, r) =>
              cells.zipWithIndex.map { case (v, c) =>
                (p, sheet, r, c, v, null: String)
              }
            }
          }
        } catch {
          case scala.util.control.NonFatal(e) =>
            quarantine(s"${e.getClass.getSimpleName}: ${e.getMessage}")
        }
      }
      .toDF("book", "sheet", "row_num", "col_num", "val", "decode_error")
    // A 0-byte book never reaches the decoder at all: Spark's file
    // scan derives splits from [0, length), so a zero-length file
    // yields NO splits and the binaryFile row simply doesn't exist —
    // a truncated upload would produce neither cells nor a
    // quarantine row, the exact silent class this method documents
    // itself as surfacing (r12 ADVICE). Quarantine them from the
    // LISTING side: a metadata-only pass over the same paths the
    // scan lists (the driver's InMemoryFileIndex does this listing
    // anyway), bounded by the number of empty files.
    val hPath = new org.apache.hadoop.fs.Path(pathGlob)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val matched = Option(fs.globStatus(hPath)).map(_.toSeq).getOrElse(Seq.empty)
    // Descend RECURSIVELY under matched directories: the
    // recursiveFileLookup scan lists leaf files at any depth, so a
    // 0-byte book nested two levels down reaches the decoder's
    // listing but would have escaped a one-level quarantine pass —
    // the exact silent class this pass exists to surface (r13
    // ADVICE). The walk applies Spark's OWN hidden-path filter
    // (InMemoryFileIndex skips any '_'/'.'-prefixed component), so
    // the quarantine covers exactly the decoder's file set — a
    // 0-byte book under `_staging/` is invisible to the scan and
    // must not produce a spurious quarantine row either. Qualify the
    // path so the quarantine row's `book` string is URI-identical to
    // binaryFile's `path` column for the same file.
    def visible(name: String): Boolean =
      !name.startsWith("_") && !name.startsWith(".")
    def leafFiles(st: org.apache.hadoop.fs.FileStatus): Seq[org.apache.hadoop.fs.FileStatus] =
      if (!st.isDirectory) Seq(st)
      else fs.listStatus(st.getPath).toSeq
        .filter(c => visible(c.getPath.getName))
        .flatMap(leafFiles)
    val empties = matched
      .flatMap(leafFiles)
      .filter(st => st.isFile && st.getLen == 0 &&
        visible(st.getPath.getName) && st.getPath.getName.endsWith(".xlsx"))
      .map(st => (fs.makeQualified(st.getPath).toString,
        "", -1, -1, "", "empty file (0 bytes)"))
    if (empties.isEmpty) decoded
    else decoded.unionAll(empties
      .toDF("book", "sheet", "row_num", "col_num", "val", "decode_error"))
  }
}
