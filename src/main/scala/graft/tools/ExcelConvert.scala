package graft.tools

import java.io.{BufferedWriter, FileWriter}
import java.util.zip.ZipFile
import javax.xml.parsers.DocumentBuilderFactory
import org.w3c.dom.{Document, Element}
import scala.collection.mutable

/** S3 — Excel (.xlsx) to CSV conversion, the missing front step of the
  * "pre-converted fixtures" decision (SURVEY §7.4-7): the reference
  * reads its monthly provider workbooks with
  * `read_excel(file, sheet = "IS Provider", skip = 13)` (`1b.:242-260`,
  * `1a.:96-98`); this utility turns those drops into CSVs the S1/S2
  * readers ingest.
  *
  * Pure JDK (an .xlsx is a zip of XML parts — no external Excel
  * dependency): resolves sheet NAMES through workbook.xml + its rels,
  * reads shared/inline strings, fills sparse cell runs from the A1-style
  * references, and CSV-quotes on write. Numbers pass through verbatim
  * (Excel dates are serial numbers; downstream parsing owns date
  * semantics, same as `read_excel`'s raw passthrough for typed columns).
  *
  * This is driver-side file prep, deliberately not a Spark job: one
  * workbook is one small file, and a folder of months parallelizes by
  * file. The Spark boundary stays at the CSV readers.
  */
object ExcelConvert {

  private def parse(zip: ZipFile, entry: String): Option[Document] =
    Option(zip.getEntry(entry)).map { e =>
      val dbf = DocumentBuilderFactory.newInstance()
      dbf.setNamespaceAware(false)
      dbf.newDocumentBuilder().parse(zip.getInputStream(e))
    }

  private def elems(doc: Document, tag: String): Seq[Element] = {
    val nl = doc.getElementsByTagName(tag)
    (0 until nl.getLength).map(nl.item(_).asInstanceOf[Element])
  }

  /** sheet name -> zip part path, via workbook.xml sheet r:id and the
    * workbook rels part. */
  def sheetParts(zip: ZipFile): Map[String, String] = {
    val rels = parse(zip, "xl/_rels/workbook.xml.rels").toSeq
      .flatMap(elems(_, "Relationship"))
      .map(r => r.getAttribute("Id") -> r.getAttribute("Target"))
      .toMap
    parse(zip, "xl/workbook.xml").toSeq.flatMap(elems(_, "sheet")).map { s =>
      val target = rels.getOrElse(s.getAttribute("r:id"), "")
      val path = if (target.startsWith("/")) target.drop(1) else s"xl/$target"
      s.getAttribute("name") -> path
    }.toMap
  }

  private def sharedStrings(zip: ZipFile): IndexedSeq[String] =
    parse(zip, "xl/sharedStrings.xml").toSeq.flatMap(elems(_, "si")).map { si =>
      // an <si> is either one <t> or rich-text runs of <r><t>..</t></r>
      elems0(si, "t").map(_.getTextContent).mkString
    }.toIndexedSeq

  private def elems0(e: Element, tag: String): Seq[Element] = {
    val nl = e.getElementsByTagName(tag)
    (0 until nl.getLength).map(nl.item(_).asInstanceOf[Element])
  }

  /** "BC7" -> 0-based column 54. */
  private[tools] def colIndex(ref: String): Int =
    ref.takeWhile(_.isLetter).foldLeft(0)((a, c) => a * 26 + (c - 'A' + 1)) - 1

  private def cellValue(c: Element, shared: IndexedSeq[String]): String = {
    val t = c.getAttribute("t")
    val v = elems0(c, "v").headOption.map(_.getTextContent)
    t match {
      case "s" => v.flatMap(i => shared.lift(i.trim.toInt)).getOrElse("")
      case "inlineStr" => elems0(c, "t").map(_.getTextContent).mkString
      case "b" => if (v.contains("1")) "TRUE" else "FALSE"
      case _ => v.getOrElse("") // "n", "str", untyped
    }
  }

  private def csvQuote(s: String): String =
    if (s.exists(ch => ch == ',' || ch == '"' || ch == '\n' || ch == '\r'))
      "\"" + s.replace("\"", "\"\"") + "\""
    else s

  /** Extract one named sheet as rows of cells (sparse refs filled with
    * empty strings; `skipRows` mirrors `read_excel(skip=)`).
    *
    * Honors the row `r` attribute: Excel does NOT serialize blank
    * rows, so a title in row 1 and a header in row 14 are two `<row>`
    * elements 12 gaps apart — the gaps must come back as empty rows or
    * `skipRows` counts the wrong rows. */
  def sheetRows(xlsxPath: String, sheetName: String,
      skipRows: Int = 0): Seq[Seq[String]] = {
    val zip = new ZipFile(xlsxPath)
    try {
      val part = sheetParts(zip).getOrElse(sheetName,
        throw new IllegalArgumentException(
          s"sheet '$sheetName' not found; have ${sheetParts(zip).keys.mkString(", ")}"))
      val shared = sharedStrings(zip)
      val doc = parse(zip, part).getOrElse(
        throw new IllegalArgumentException(s"missing sheet part $part"))
      val rows = mutable.ArrayBuffer.empty[Seq[String]]
      elems(doc, "row").foreach { r =>
        val rowNum = Option(r.getAttribute("r")).filter(_.nonEmpty)
          .map(_.toInt).getOrElse(rows.length + 1) // 1-based
        while (rows.length < rowNum - 1) rows += Seq.empty // unserialized blanks
        val cells = elems0(r, "c")
        val out = mutable.ArrayBuffer.empty[String]
        cells.foreach { c =>
          val idx = Option(c.getAttribute("r")).filter(_.nonEmpty)
            .map(colIndex).getOrElse(out.length)
          while (out.length < idx) out += ""
          out += cellValue(c, shared)
        }
        rows += out.toSeq
      }
      rows.drop(skipRows).toSeq
    } finally zip.close()
  }

  /** Convert one sheet to a CSV file; returns the row count written. */
  def xlsxToCsv(xlsxPath: String, csvPath: String, sheetName: String,
      skipRows: Int = 0): Int = {
    val rows = sheetRows(xlsxPath, sheetName, skipRows)
    val w = new BufferedWriter(new FileWriter(csvPath))
    try {
      rows.foreach(r => { w.write(r.map(csvQuote).mkString(",")); w.newLine() })
      rows.length
    } finally w.close()
  }

  /** S3 (ODS leg) — OpenDocument spreadsheet to rows: the reference's
    * landing pages ship some monthly drops as .ods (`README.md:49`),
    * which is ALSO a zip of XML (one `content.xml` carries every
    * sheet). Same contract as [[sheetRows]]: named sheet, `skipRows`,
    * sparse/blank structure reconstructed — here from ODS's
    * `number-rows/columns-repeated` run-length encoding rather than
    * xlsx's A1 refs. Repeat runs are capped and trailing empties
    * trimmed: ODS pads the used area to the full 16k x 1M grid with
    * one huge repeated empty cell/row, which must not materialize. */
  private val OdsRepeatCap = 10000

  def odsSheetRows(odsPath: String, sheetName: String,
      skipRows: Int = 0): Seq[Seq[String]] = {
    val zip = new ZipFile(odsPath)
    try {
      val doc = parse(zip, "content.xml").getOrElse(
        throw new IllegalArgumentException(s"missing content.xml in $odsPath"))
      val tables = elems(doc, "table:table")
      val table = tables.find(_.getAttribute("table:name") == sheetName)
        .getOrElse(throw new IllegalArgumentException(
          s"sheet '$sheetName' not found; have " +
            tables.map(_.getAttribute("table:name")).mkString(", ")))
      def repeatOf(e: Element, attr: String): Int =
        Option(e.getAttribute(attr)).filter(_.nonEmpty)
          .map(_.toInt.min(OdsRepeatCap).max(1)).getOrElse(1)
      val rows = mutable.ArrayBuffer.empty[Seq[String]]
      elems0(table, "table:table-row").foreach { r =>
        val cells = mutable.ArrayBuffer.empty[String]
        elems0(r, "table:table-cell").foreach { c =>
          val v = c.getAttribute("office:value-type") match {
            case "float" | "currency" | "percentage" =>
              c.getAttribute("office:value")
            case "boolean" =>
              if (c.getAttribute("office:boolean-value") == "true") "TRUE"
              else "FALSE"
            case "date" => c.getAttribute("office:date-value")
            case _ => elems0(c, "text:p").map(_.getTextContent).mkString
          }
          (0 until repeatOf(c, "table:number-columns-repeated"))
            .foreach(_ => cells += v)
        }
        while (cells.nonEmpty && cells.last.isEmpty)
          cells.remove(cells.length - 1) // grid-padding tail
        val rowOut = cells.toSeq
        (0 until repeatOf(r, "table:number-rows-repeated"))
          .foreach(_ => rows += rowOut)
      }
      while (rows.nonEmpty && rows.last.isEmpty)
        rows.remove(rows.length - 1) // grid-padding tail rows
      rows.drop(skipRows).toSeq
    } finally zip.close()
  }

  /** Convert one .ods sheet to a CSV file; returns rows written. */
  def odsToCsv(odsPath: String, csvPath: String, sheetName: String,
      skipRows: Int = 0): Int = {
    val rows = odsSheetRows(odsPath, sheetName, skipRows)
    val w = new BufferedWriter(new FileWriter(csvPath))
    try {
      rows.foreach(r => { w.write(r.map(csvQuote).mkString(",")); w.newLine() })
      rows.length
    } finally w.close()
  }

  /** S4 — unzip a monthly "Full CSV" drop into a folder (`1b.:184-191`:
    * download -> unzip -> delete zip; the download leg stays
    * driver-side, extraction is this). Rejects entries that would
    * escape `destDir` (zip-slip). Returns the extracted paths. */
  def unzip(zipPath: String, destDir: String): Seq[String] = {
    val dest = java.nio.file.Paths.get(destDir).toAbsolutePath.normalize()
    java.nio.file.Files.createDirectories(dest)
    val zip = new ZipFile(zipPath)
    try {
      val entries = zip.entries()
      val out = mutable.ArrayBuffer.empty[String]
      while (entries.hasMoreElements) {
        val e = entries.nextElement()
        val target = dest.resolve(e.getName).normalize()
        require(target.startsWith(dest), s"zip entry escapes dest: ${e.getName}")
        if (e.isDirectory) java.nio.file.Files.createDirectories(target)
        else {
          java.nio.file.Files.createDirectories(target.getParent)
          val in = zip.getInputStream(e)
          try java.nio.file.Files.copy(in, target,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
          finally in.close()
          out += target.toString
        }
      }
      out.toSeq
    } finally zip.close()
  }
}
