package graft

import java.io.ByteArrayOutputStream
import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** The OOXML (.xlsx) boundary: writer/parser round-trip and the
  * etl_parse_xlsx ⇔ etl_parse content identity the oracle strategy
  * rests on (DuckDB checks the xlsx path through the content-equal
  * CSV book — that is only sound if the two raw books really parse
  * to identical rows).
  */
class XlsxSpec extends AnyFunSuite {
  import TestSpark._

  test("xlsx writer → parser round-trips rows, escapes, and empty cells") {
    val rows = Seq(
      Seq("yr", "flow", "mes", "val"),
      Seq("1997", "export", "Enero", "12345"),
      Seq("1997", "<&\">", "n.d.", ""),
      Seq("1998", "import", "Ñandú & <tag>", "-7"))
    val buf = new ByteArrayOutputStream()
    graft.sources.Xlsx.writeWorkbook(buf, rows, "Libro1")
    assert(graft.sources.Xlsx.parseSheet(buf.toByteArray) == rows)
  }

  test("xlsx bytes are deterministic for identical rows") {
    val rows = Seq(Seq("a", "b"), Seq("1", "2"))
    def bytes(): Array[Byte] = {
      val buf = new ByteArrayOutputStream()
      graft.sources.Xlsx.writeWorkbook(buf, rows)
      buf.toByteArray
    }
    assert(java.util.Arrays.equals(bytes(), bytes()))
  }

  test("readSheets decodes a workbook through the binaryFile scan") {
    val dir = Files.createTempDirectory("graft-xlsx")
    val rows = Seq(Seq("h1", "h2")) ++ (1 to 5).map(i => Seq(s"k$i", s"v$i"))
    val os = Files.newOutputStream(dir.resolve("t.xlsx"))
    try graft.sources.Xlsx.writeWorkbook(os, rows) finally os.close()
    val got = graft.sources.Xlsx.readSheets(spark, dir.toString)
      .collect()
      .map(r => (r.getInt(1), r.getSeq[String](2)))
      .sortBy(_._1)
    assert(got.length == 6)
    assert(got.map(_._2.toSeq).toSeq == rows)
  }

  test("etl_parse_xlsx parses the workbook to the exact etl_parse rows") {
    val csv = SparkEntry.queries("etl_parse")(spark, sf).collect().toSeq
    val xlsx = SparkEntry.queries("etl_parse_xlsx")(spark, sf).collect().toSeq
    assert(xlsx.nonEmpty)
    assert(xlsx == csv,
      "xlsx-ingested book diverged from the CSV book the oracle checks")
  }
}
