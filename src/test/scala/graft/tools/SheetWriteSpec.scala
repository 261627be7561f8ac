package graft.tools

import org.scalatest.funsuite.AnyFunSuite

/** SheetWrite (fixture-side spreadsheet writers) round-trips through
  * the ExcelConvert readers — the same pairing the S3 gate queries
  * (`q_s3_xlsx_ingest`, `q_s3_ods_ingest`) rely on. */
class SheetWriteSpec extends AnyFunSuite {

  private val rows = Seq(
    Seq("Monthly extract"),              // title
    Seq.empty[String],                   // blank row
    Seq("Code", "Name, \"quoted\"", "Balance"),
    Seq("RX1", "St <Mary's> & Co", "42.5"),
    Seq("RX2", "", "-7"))                // sparse middle cell

  test("xlsx writer round-trips through sheetRows (skip, types, escaping)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sw")
    val path = dir.resolve("book.xlsx").toString
    SheetWrite.xlsx(path, Seq("IS Provider" -> rows, "Notes" -> Seq(Seq("x"))))
    val back = ExcelConvert.sheetRows(path, "IS Provider", skipRows = 2)
    assert(back == Seq(
      Seq("Code", "Name, \"quoted\"", "Balance"),
      Seq("RX1", "St <Mary's> & Co", "42.5"),
      Seq("RX2", "", "-7")))
    // numeric cells written untyped survive as their literal text
    assert(back(1)(2) == "42.5" && back(2)(2) == "-7")
    assert(ExcelConvert.sheetRows(path, "Notes") == Seq(Seq("x")))
  }

  test("ods writer round-trips through odsSheetRows") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sw")
    val path = dir.resolve("book.ods").toString
    SheetWrite.ods(path, Seq("Notes" -> Seq(Seq("skip")), "IS Provider" -> rows))
    val back = ExcelConvert.odsSheetRows(path, "IS Provider", skipRows = 2)
    // ODS trims trailing empty cells per row (grid-padding contract),
    // so the sparse middle cell survives but a trailing blank would not
    assert(back == Seq(
      Seq("Code", "Name, \"quoted\"", "Balance"),
      Seq("RX1", "St <Mary's> & Co", "42.5"),
      Seq("RX2", "", "-7")))
  }

  test("zip wrapper round-trips through unzip") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sw")
    val xlsx = dir.resolve("book.xlsx")
    SheetWrite.xlsx(xlsx.toString, Seq("S" -> Seq(Seq("v"))))
    val zip = dir.resolve("drop.zip").toString
    SheetWrite.zip(zip, Seq("inner/book.xlsx" -> xlsx))
    val out = ExcelConvert.unzip(zip, dir.resolve("ex").toString)
    assert(out.size == 1 && out.head.endsWith("inner/book.xlsx"))
    assert(ExcelConvert.sheetRows(out.head, "S") == Seq(Seq("v")))
  }

  test("colName is the inverse of colIndex") {
    Seq(0, 1, 25, 26, 27, 51, 52, 701, 702, 16383).foreach { i =>
      assert(ExcelConvert.colIndex(SheetWrite.colName(i) + "1") == i)
    }
  }
}
