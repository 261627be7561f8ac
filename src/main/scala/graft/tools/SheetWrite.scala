package graft.tools

import java.util.zip.{ZipEntry, ZipOutputStream}

/** Fixture-side spreadsheet WRITERS — the publishing half of the S3/S4
  * ingest legs (reference `1b.:184-260`: monthly provider workbooks
  * arrive as .xlsx/.ods, often wrapped in a zip). The driver's star
  * testdata has no spreadsheet inputs, so gate queries STAGE one from
  * a parquet table with these writers, then ingest it back through
  * [[ExcelConvert]] + the S1 CSV reader — putting the whole
  * spreadsheet leg under the DuckDB hash gate (the oracle reads the
  * original parquet; the staged workbook round-trip must be
  * value-invisible).
  *
  * Pure JDK, same as the readers: an .xlsx/.ods is a zip of XML.
  * Cells that parse as numbers are written as typed numeric cells
  * (Excel's own behavior for pasted CSV), everything else as inline
  * strings — matching what [[ExcelConvert.sheetRows]]/[[ExcelConvert
  * .odsSheetRows]] read back verbatim. Driver-side file prep by
  * design (one workbook is one small file); the Spark boundary stays
  * at the CSV readers, exactly like the conversion direction.
  */
object SheetWrite {

  private def xml(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;")

  private val Num = """-?\d+(\.\d+)?([eE][-+]?\d+)?""".r

  private def isNum(s: String): Boolean = Num.matches(s)

  /** 0-based column index -> A1-style letters (inverse of
    * [[ExcelConvert.colIndex]]). */
  private[tools] def colName(i: Int): String = {
    var n = i + 1; val sb = new StringBuilder
    while (n > 0) { val r = (n - 1) % 26; sb.insert(0, ('A' + r).toChar); n = (n - 1) / 26 }
    sb.toString
  }

  private def put(zos: ZipOutputStream, name: String, content: String): Unit = {
    zos.putNextEntry(new ZipEntry(name))
    zos.write(content.getBytes("UTF-8"))
    zos.closeEntry()
  }

  /** Write a minimal .xlsx: one zip of XML parts, inline strings (no
    * shared-string table — readers must handle both; ours does),
    * numeric cells untyped with raw `<v>`. Sheets render in the given
    * order with 1-based row/cell `r` refs; empty rows are serialized
    * (harmless — the reader also reconstructs unserialized gaps). */
  def xlsx(path: String, sheets: Seq[(String, Seq[Seq[String]])]): Unit = {
    val zos = new ZipOutputStream(new java.io.FileOutputStream(path))
    try {
      put(zos, "[Content_Types].xml",
        """<?xml version="1.0" encoding="UTF-8"?>
          |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
          |<Default Extension="xml" ContentType="application/xml"/>
          |</Types>""".stripMargin)
      put(zos, "_rels/.rels",
        """<Relationships><Relationship Id="rId1" Target="xl/workbook.xml"/></Relationships>""")
      put(zos, "xl/workbook.xml",
        "<workbook><sheets>" + sheets.zipWithIndex.map { case ((name, _), i) =>
          s"""<sheet name="${xml(name)}" sheetId="${i + 1}" r:id="rId${i + 1}"/>"""
        }.mkString + "</sheets></workbook>")
      put(zos, "xl/_rels/workbook.xml.rels",
        "<Relationships>" + sheets.indices.map { i =>
          s"""<Relationship Id="rId${i + 1}" Target="worksheets/sheet${i + 1}.xml"/>"""
        }.mkString + "</Relationships>")
      sheets.zipWithIndex.foreach { case ((_, rows), si) =>
        val body = rows.zipWithIndex.map { case (cells, r) =>
          val cs = cells.zipWithIndex.map { case (v, c) =>
            val ref = s"${colName(c)}${r + 1}"
            if (v.isEmpty) "" // sparse: omit, reader fills the gap
            else if (isNum(v)) s"""<c r="$ref"><v>$v</v></c>"""
            else s"""<c r="$ref" t="inlineStr"><is><t>${xml(v)}</t></is></c>"""
          }.mkString
          s"""<row r="${r + 1}">$cs</row>"""
        }.mkString
        put(zos, s"xl/worksheets/sheet${si + 1}.xml",
          s"<worksheet><sheetData>$body</sheetData></worksheet>")
      }
    } finally zos.close()
  }

  /** Write a minimal .ods: one content.xml carrying every sheet;
    * numeric cells typed float with `office:value`, strings as
    * `text:p`. No repeat-run compression (fixtures are small; the
    * reader handles both encodings). */
  def ods(path: String, sheets: Seq[(String, Seq[Seq[String]])]): Unit = {
    val zos = new ZipOutputStream(new java.io.FileOutputStream(path))
    try {
      put(zos, "mimetype", "application/vnd.oasis.opendocument.spreadsheet")
      val tables = sheets.map { case (name, rows) =>
        val body = rows.map { cells =>
          val cs = cells.map { v =>
            if (v.isEmpty) "<table:table-cell/>"
            else if (isNum(v))
              s"""<table:table-cell office:value-type="float" office:value="$v"/>"""
            else
              s"""<table:table-cell office:value-type="string"><text:p>${xml(v)}</text:p></table:table-cell>"""
          }.mkString
          s"<table:table-row>$cs</table:table-row>"
        }.mkString
        s"""<table:table table:name="${xml(name)}">$body</table:table>"""
      }.mkString
      put(zos, "content.xml",
        s"""<?xml version="1.0" encoding="UTF-8"?><office:document-content>$tables</office:document-content>""")
    } finally zos.close()
  }

  /** Wrap files into a zip — the monthly "Full CSV"/workbook drop
    * shape that [[ExcelConvert.unzip]] (S4) opens. */
  def zip(zipPath: String, files: Seq[(String, java.nio.file.Path)]): Unit = {
    val zos = new ZipOutputStream(new java.io.FileOutputStream(zipPath))
    try files.foreach { case (entry, src) =>
      zos.putNextEntry(new ZipEntry(entry))
      zos.write(java.nio.file.Files.readAllBytes(src))
      zos.closeEntry()
    } finally zos.close()
  }
}
