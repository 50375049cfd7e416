package graft.sources

import java.io.{BufferedOutputStream, FileOutputStream}
import java.nio.charset.StandardCharsets
import java.util.zip.{ZipEntry, ZipOutputStream}

import org.apache.spark.sql.{DataFrame, Row}

/** Bounded xlsx export (reference: spark/common/export_to_excel.py:51-86 —
  * sample/limit, collect to driver, write a workbook for analysts).
  *
  * The reference leans on pandas+openpyxl; none of that exists on the JVM
  * side, but xlsx is just a ZIP of SpreadsheetML parts, and a bounded
  * sample sheet needs only the minimal ones ([Content_Types], _rels,
  * workbook, one worksheet with inline strings) — `java.util.zip` +
  * strings, zero dependencies. Numbers and booleans are written as typed
  * cells so spreadsheets can aggregate them; everything else becomes an
  * XML-escaped inline string; nulls are empty cells.
  *
  * Driver-bounded by construction: `maxRows` caps the limit and the rows
  * stream through `toLocalIterator` — the full frame is never collected.
  */
object XlsxExport {

  /** Write `df` (first `maxRows` rows) as a single-sheet xlsx. */
  def write(df: DataFrame, path: String, maxRows: Int = 1000,
            sheetName: String = "sample"): Unit = {
    import scala.jdk.CollectionConverters._
    val cols = df.columns.toSeq
    val rows = df.limit(maxRows).toLocalIterator().asScala
    writeRows(cols, rows, path, sheetName)
  }

  private def esc(s: String): String = {
    val cleaned = s.filter(c => c == '\t' || c == '\n' || c == '\r' || c >= ' ')
    cleaned.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;")
  }

  private def numCell(ref: String, repr: String): String =
    s"""<c r="$ref" t="n"><v>$repr</v></c>"""

  private def strCell(ref: String, s: String): String =
    s"""<c r="$ref" t="inlineStr"><is><t>${esc(s)}</t></is></c>"""

  private def cellXml(ref: String, v: Any): String = v match {
    case null => ""
    case n: Byte => numCell(ref, n.toString)
    case n: Short => numCell(ref, n.toString)
    case n: Int => numCell(ref, n.toString)
    case n: Long => numCell(ref, n.toString)
    // NaN/Infinity are not valid SpreadsheetML numbers — emit as strings
    case n: Float if java.lang.Float.isFinite(n) => numCell(ref, n.toString)
    case n: Double if java.lang.Double.isFinite(n) => numCell(ref, n.toString)
    case n: java.math.BigDecimal => numCell(ref, n.toString)
    case b: Boolean => s"""<c r="$ref" t="b"><v>${if (b) 1 else 0}</v></c>"""
    case other => strCell(ref, String.valueOf(other))
  }

  /** A1-style column letters: 0 → A, 25 → Z, 26 → AA … */
  private def colLetters(i: Int): String = {
    var n = i; val sb = new StringBuilder
    while (n >= 0) { sb.insert(0, ('A' + n % 26).toChar); n = n / 26 - 1 }
    sb.toString
  }

  private[sources] def writeRows(cols: Seq[String], rows: Iterator[Row],
                                 path: String, sheetName: String): Unit = {
    val zos = new ZipOutputStream(new BufferedOutputStream(new FileOutputStream(path)))
    def part(name: String, body: String): Unit = {
      zos.putNextEntry(new ZipEntry(name))
      zos.write(body.getBytes(StandardCharsets.UTF_8))
      zos.closeEntry()
    }
    try {
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
           |<sheets><sheet name="${esc(sheetName)}" sheetId="1" r:id="rId1"/></sheets>
           |</workbook>""".stripMargin)
      part("xl/_rels/workbook.xml.rels",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
          |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
          |</Relationships>""".stripMargin)

      // the worksheet streams: header row, then data rows off the iterator
      zos.putNextEntry(new ZipEntry("xl/worksheets/sheet1.xml"))
      def w(s: String): Unit = zos.write(s.getBytes(StandardCharsets.UTF_8))
      w("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""")
      w("""<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""")
      w("<row r=\"1\">")
      cols.zipWithIndex.foreach { case (c, i) =>
        w(s"""<c r="${colLetters(i)}1" t="inlineStr"><is><t>${esc(c)}</t></is></c>""")
      }
      w("</row>")
      var rn = 2
      rows.foreach { row =>
        w(s"""<row r="$rn">""")
        var i = 0
        while (i < cols.length) {
          w(cellXml(s"${colLetters(i)}$rn", row.get(i)))
          i += 1
        }
        w("</row>")
        rn += 1
      }
      w("</sheetData></worksheet>")
      zos.closeEntry()
    } finally zos.close()
  }
}
