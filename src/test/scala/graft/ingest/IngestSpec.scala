package graft.ingest

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** E1 replication (SURVEY.md §3): monthly append with era drift, IS
  * membership flagging, month-partitioned parquet sink, and the
  * partition-pruning payoff on read. */
class IngestSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("appendMonths: union-by-name across era drift + monthyr tag") {
    // old era: 2 band columns; new era adds Gt53
    val apr = Seq(("P1", 10L, 5L)).toDF("code", "Gt1", "Gt2")
    val may = Seq(("P1", 1L, 2L, 3L)).toDF("code", "Gt1", "Gt2", "Gt53")
    val fact = Ingest.appendMonths(Seq("Apr20" -> apr, "May21" -> may))
    assert(fact.columns.toSet == Set("code", "Gt1", "Gt2", "Gt53", "monthyr"))
    val aprRow = fact.filter($"monthyr" === "Apr20").head
    assert(aprRow.isNullAt(aprRow.fieldIndex("Gt53"))) // era drift -> null fill
    assert(fact.count() == 2)
  }

  test("IS flag joins per-month membership (flips between months)") {
    val fact = Seq(("Apr20", "P1"), ("Apr20", "P2"), ("May20", "P1"))
      .toDF("monthyr", "Provider_Org_Code")
    val membership = Seq(("Apr20", "P1")).toDF("monthyr", "codes")
    val flagged = Ingest.withIsProviderFlag(fact, membership)
      .select("monthyr", "Provider_Org_Code", "IS_provider")
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    assert(flagged == Set(("Apr20", "P1", 1), ("Apr20", "P2", 0), ("May20", "P1", 0)))
  }

  test("partitioned sink: dynamic overwrite replaces only re-ingested months; reads prune") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ing").toString + "/fact"
    val v1 = Seq(("Apr20", "P1", 1L), ("May20", "P1", 2L))
      .toDF("monthyr", "code", "v")
    Ingest.writePartitioned(v1, dir)
    // re-ingest May only, with corrected value
    val v2 = Seq(("May20", "P1", 99L)).toDF("monthyr", "code", "v")
    Ingest.writePartitioned(v2, dir)
    val back = spark.read.parquet(dir)
    assert(back.count() == 2) // Apr kept, May replaced (not appended)
    assert(back.filter($"monthyr" === "May20").head.getAs[Long]("v") == 99L)
    // month filter is partition pruning, not a data scan of all months
    val plan = back.filter($"monthyr" === "Apr20")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") || !plan.contains("May20"))
  }

  test("csv mangled-name shim mirrors R make.names") {
    val dir = java.nio.file.Files.createTempDirectory("graft-csv").toString + "/c"
    Seq((1, 2.0)).toDF("Provider Org Code", "Total-All")
      .write.option("header", "true").csv(dir)
    val cols = Ingest.csvMangledNames(spark, dir).columns.toSet
    assert(cols == Set("Provider.Org.Code", "Total.All"))
  }

  test("headerless csv positional selection") {
    val dir = java.nio.file.Files.createTempDirectory("graft-hcsv").toString + "/c"
    Seq(("RX1", "TRUST A", "ig1", "AB1 2CD")).toDF("a", "b", "c", "d")
      .write.option("header", "false").csv(dir)
    val got = Ingest.headerlessCsv(spark, dir,
      Map(1 -> "provider_code", 2 -> "provider_name", 4 -> "pcode")).head
    assert(got.getString(0) == "RX1" && got.getString(1) == "TRUST A"
      && got.getString(2) == "AB1 2CD")
  }

  test("anchorLinks + returnLinksRtt classify the five series per month (1b.:83-138)") {
    // a saved landing page per series; Jul has all five files, Aug only
    // two -> remaining columns null like R's links[str_detect][1] = NA
    val html =
      """<html><body>
        |<a href="/x/Full-CSV-Jul21.zip">Full CSV data file Jul21 (ZIP)</a>
        |<a class="x" href="/x/Incomplete-Provider-Jul21.xls">Incomplete Provider Jul21 (XLS)</a>
        |<a href="/x/New-Periods-Provider-Jul21.xls">New Periods Provider Jul21</a>
        |<a href="/x/NonAdmitted-Provider-Jul21.xls">NonAdmitted Provider Jul21</a>
        |<a href="/x/Admitted-Provider-Jul21.xls">Admitted Provider Jul21</a>
        |<a href="/x/full-extract-Aug21.zip">Full CSV Aug21</a>
        |<a href="/x/Incomplete-Provider-Aug21.xls">Incomplete Provider Aug21</a>
        |<a href="/y/guidance.pdf">Guidance notes</a>
        |</body></html>""".stripMargin
    val pages = Seq(("2122", html)).toDF("series", "html")
    val anchors = Ingest.anchorLinks(pages, "html")
    assert(anchors.count() == 8)
    val cal = Seq(("Jul21", "2122"), ("Aug21", "2122"), ("Sep21", "2122"))
      .toDF("month", "series")
    val out = Ingest.returnLinksRtt(cal, anchors)
      .orderBy("month").collect()
    assert(out.length == 3, "unpublished months must still produce a row")
    val aug = out(0); val jul = out(1); val sep = out(2)
    // Sep21 has no anchors at all -> all-null link columns (R's NA row)
    assert(sep.getAs[String]("month") == "Sep21")
    (2 until sep.length).foreach(i => assert(sep.isNullAt(i)))
    assert(jul.getAs[String]("full_csv_link") == "/x/Full-CSV-Jul21.zip")
    assert(jul.getAs[String]("providers_link_incomp") == "/x/Incomplete-Provider-Jul21.xls")
    assert(jul.getAs[String]("providers_link_new") == "/x/New-Periods-Provider-Jul21.xls")
    // NonAdmitted listed BEFORE Admitted: the lookbehind keeps the
    // admitted column off the NonAdmitted link (reference's str_detect
    // would have taken it)
    assert(jul.getAs[String]("providers_link_adm") == "/x/Admitted-Provider-Jul21.xls")
    assert(jul.getAs[String]("providers_link_nonadm") == "/x/NonAdmitted-Provider-Jul21.xls")
    assert(aug.getAs[String]("full_csv_link") == "/x/full-extract-Aug21.zip")
    assert(aug.isNullAt(aug.fieldIndex("providers_link_adm")))
    assert(aug.isNullAt(aug.fieldIndex("providers_link_new")))
  }

  test("ExcelConvert: named sheet + skip rows + shared/inline strings -> CSV (S3)") {
    import java.util.zip.{ZipEntry, ZipOutputStream}
    val dir = java.nio.file.Files.createTempDirectory("graft-xlsx")
    val xlsx = dir.resolve("book.xlsx").toString
    val zos = new ZipOutputStream(new java.io.FileOutputStream(xlsx))
    def put(name: String, content: String): Unit = {
      zos.putNextEntry(new ZipEntry(name))
      zos.write(content.getBytes("UTF-8")); zos.closeEntry()
    }
    put("xl/workbook.xml",
      """<workbook><sheets>
        |<sheet name="Notes" sheetId="1" r:id="rId1"/>
        |<sheet name="IS Provider" sheetId="2" r:id="rId2"/>
        |</sheets></workbook>""".stripMargin)
    put("xl/_rels/workbook.xml.rels",
      """<Relationships>
        |<Relationship Id="rId1" Target="worksheets/sheet1.xml"/>
        |<Relationship Id="rId2" Target="worksheets/sheet2.xml"/>
        |</Relationships>""".stripMargin)
    put("xl/sharedStrings.xml",
      """<sst><si><t>Provider Code</t></si><si><t>Provider, "Name"</t></si>
        |<si><r><t>RX</t></r><r><t>1</t></r></si></sst>""".stripMargin)
    put("xl/worksheets/sheet1.xml", "<worksheet><sheetData/></worksheet>")
    // rows 2-3 are BLANK and unserialized (Excel omits empty rows):
    // skipRows must count them via the r attributes, like read_excel
    put("xl/worksheets/sheet2.xml",
      """<worksheet><sheetData>
        |<row r="1"><c r="A1" t="inlineStr"><is><t>skip me</t></is></c></row>
        |<row r="4"><c r="A4" t="s"><v>0</v></c><c r="B4" t="s"><v>1</v></c></row>
        |<row r="5"><c r="A5" t="s"><v>2</v></c><c r="C5"><v>42.5</v></c></row>
        |</sheetData></worksheet>""".stripMargin)
    zos.close()
    val csv = dir.resolve("out.csv").toString
    val n = graft.tools.ExcelConvert.xlsxToCsv(xlsx, csv, "IS Provider", skipRows = 3)
    assert(n == 2)
    val lines = scala.io.Source.fromFile(csv).getLines().toSeq
    // header row survives skip; quoted comma/quote; rich-text si joined;
    // sparse B3 filled empty
    assert(lines == Seq("Provider Code,\"Provider, \"\"Name\"\"\"", "RX1,,42.5"))
    // the converted CSV is RFC 4180 (doubled quotes, like Excel/R) —
    // round-trip with Spark's escape option set accordingly
    val back = spark.read.option("header", "true").option("escape", "\"").csv(csv)
    assert(back.columns.toSeq == Seq("Provider Code", "Provider, \"Name\""))
    assert(back.head.getString(0) == "RX1")
  }

  test("ExcelConvert: ODS named sheet + repeats + grid-padding trim -> CSV (S3 ODS leg)") {
    import java.util.zip.{ZipEntry, ZipOutputStream}
    val dir = java.nio.file.Files.createTempDirectory("graft-ods")
    val ods = dir.resolve("book.ods").toString
    val zos = new ZipOutputStream(new java.io.FileOutputStream(ods))
    zos.putNextEntry(new ZipEntry("content.xml"))
    // sheet 2 exercises: a title row, a 2-row repeated BLANK gap (so
    // skipRows must see 3 leading rows), a mid-row repeated value run,
    // numeric/date typed cells, and the full-grid empty padding tail
    // that must be trimmed, not materialized
    zos.write(
      """<office:document-content>
        |<table:table table:name="Notes"><table:table-row/></table:table>
        |<table:table table:name="IS Provider">
        |<table:table-row><table:table-cell office:value-type="string">
        |  <text:p>skip me</text:p></table:table-cell></table:table-row>
        |<table:table-row table:number-rows-repeated="2"/>
        |<table:table-row>
        |  <table:table-cell office:value-type="string"><text:p>Code</text:p></table:table-cell>
        |  <table:table-cell office:value-type="string" table:number-columns-repeated="2"><text:p>dup</text:p></table:table-cell>
        |  <table:table-cell office:value-type="float" office:value="42.5"/>
        |</table:table-row>
        |<table:table-row>
        |  <table:table-cell office:value-type="string"><text:p>RX1</text:p></table:table-cell>
        |  <table:table-cell table:number-columns-repeated="2"/>
        |  <table:table-cell office:value-type="date" office:date-value="2021-07-01"/>
        |  <table:table-cell table:number-columns-repeated="16380"/>
        |</table:table-row>
        |<table:table-row table:number-rows-repeated="1048570"/>
        |</table:table>
        |</office:document-content>""".stripMargin.getBytes("UTF-8"))
    zos.closeEntry(); zos.close()
    val csv = dir.resolve("out.csv").toString
    val n = graft.tools.ExcelConvert.odsToCsv(ods, csv, "IS Provider", skipRows = 3)
    assert(n == 2)
    val lines = scala.io.Source.fromFile(csv).getLines().toSeq
    assert(lines == Seq("Code,dup,dup,42.5", "RX1,,,2021-07-01"))
    val e = intercept[IllegalArgumentException] {
      graft.tools.ExcelConvert.odsSheetRows(ods, "Missing")
    }
    assert(e.getMessage.contains("IS Provider")) // names listed in the error
  }

  test("unzip extracts a monthly drop and rejects zip-slip entries (S4)") {
    import java.util.zip.{ZipEntry, ZipOutputStream}
    val dir = java.nio.file.Files.createTempDirectory("graft-zip")
    val zip = dir.resolve("m.zip").toString
    val zos = new ZipOutputStream(new java.io.FileOutputStream(zip))
    zos.putNextEntry(new ZipEntry("extract/full.csv"))
    zos.write("a,b\n1,2\n".getBytes("UTF-8")); zos.closeEntry()
    zos.close()
    val out = graft.tools.ExcelConvert.unzip(zip, dir.resolve("out").toString)
    assert(out.length == 1 && out.head.endsWith("extract/full.csv"))
    assert(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(out.head))).startsWith("a,b"))

    val evil = dir.resolve("evil.zip").toString
    val z2 = new ZipOutputStream(new java.io.FileOutputStream(evil))
    z2.putNextEntry(new ZipEntry("../escape.txt"))
    z2.write("x".getBytes); z2.closeEntry(); z2.close()
    intercept[IllegalArgumentException] {
      graft.tools.ExcelConvert.unzip(evil, dir.resolve("out2").toString)
    }
  }

  test("E1 chain end-to-end: landing page -> classified link -> unzip -> " +
      "xlsx -> mangled CSV -> normalized partitioned fact (1b. composed)") {
    import java.util.zip.{ZipEntry, ZipOutputStream}
    val dir = java.nio.file.Files.createTempDirectory("graft-e1")

    // 1. the monthly xlsx provider extract, as published (header row
    // with the wide band names; inline strings; numeric cells)
    val xlsx = dir.resolve("Incomplete-Provider-Jul21.xlsx").toString
    val zx = new ZipOutputStream(new java.io.FileOutputStream(xlsx))
    def putX(name: String, content: String): Unit = {
      zx.putNextEntry(new ZipEntry(name))
      zx.write(content.getBytes("UTF-8")); zx.closeEntry()
    }
    putX("xl/workbook.xml",
      """<workbook><sheets><sheet name="Provider" sheetId="1" r:id="rId1"/>
        |</sheets></workbook>""".stripMargin)
    putX("xl/_rels/workbook.xml.rels",
      """<Relationships>
        |<Relationship Id="rId1" Target="worksheets/sheet1.xml"/>
        |</Relationships>""".stripMargin)
    def istr(ref: String, s: String) =
      s"""<c r="$ref" t="inlineStr"><is><t>$s</t></is></c>"""
    putX("xl/worksheets/sheet1.xml",
      s"""<worksheet><sheetData>
        |<row r="1">${istr("A1", "Provider Code")}${istr("B1", "Treatment Function")}
        |${istr("C1", "Gt 00 To 01 Weeks SUM 1")}${istr("D1", "Gt 01 To 02 Weeks SUM 1")}
        |${istr("E1", "Total")}</row>
        |<row r="2">${istr("A2", "RX1")}${istr("B2", "Total")}
        |<c r="C2"><v>10</v></c><c r="D2"><v>30</v></c><c r="E2"><v>40</v></c></row>
        |</sheetData></worksheet>""".stripMargin)
    zx.close()

    // 2. zip it into the monthly drop artifact
    val zip = dir.resolve("Incomplete-Provider-Jul21.zip").toString
    val zz = new ZipOutputStream(new java.io.FileOutputStream(zip))
    zz.putNextEntry(new ZipEntry("Incomplete-Provider-Jul21.xlsx"))
    zz.write(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(xlsx)))
    zz.closeEntry(); zz.close()

    // 3. scrape + classify the landing page; the href resolves to the
    // local drop (the network fetch leg is driver-side by design —
    // zero-egress env; everything from the artifact on is the engine)
    val pages = Seq(("2122",
      s"""<html><a href="$zip">Incomplete Provider Jul21 (ZIP)</a></html>"""))
      .toDF("series", "html")
    val links = Ingest.returnLinksRtt(
      Seq(("Jul21", "2122")).toDF("month", "series"),
      Ingest.anchorLinks(pages, "html"))
    val link = links.head.getAs[String]("providers_link_incomp")
    assert(link == zip, "classifier must pick the monthly zip by href pattern")

    // 4. extract + convert (S4 + S3)
    val extracted = graft.tools.ExcelConvert.unzip(link, dir.resolve("x").toString)
    val xlsxIn = extracted.find(_.endsWith(".xlsx")).get
    val csv = dir.resolve("jul21.csv").toString
    assert(graft.tools.ExcelConvert.xlsxToCsv(xlsxIn, csv, "Provider") == 2)

    // 5. mangled-name read -> band normalization -> partitioned sink
    val raw = Ingest.csvMangledNames(spark, csv)
    assert(raw.columns.contains("Gt.00.To.01.Weeks.SUM.1"))
    val fact = graft.schema.RttSchema.normalizeWeeks(raw)
      .withColumn("monthyr", lit("Jul21"))
    val sink = dir.resolve("fact").toString
    Ingest.writePartitioned(fact, sink)
    val back = spark.read.parquet(sink)
    assert(back.count() == 1)
    val row = back.head
    assert(row.getAs[String]("Provider.Code") == "RX1")
    assert(row.getSeq[Long](row.fieldIndex("weeks")).toList == List(10L, 30L))
    assert(row.getAs[String]("Total") == "40", "non-band columns survive as-is")
  }
}
