package graft

import graft.sources.{IoOps, Xlsx}
import org.apache.spark.sql.types._

/** xlsx_table / xlsx_cells via the JDK-only OOXML parser
  * (reference: janitor/io.py:159, io.py:345).
  */
class XlsxSpec extends SparkSpec {
  import spark.implicits._

  private def tmpXlsx(name: String, rows: Seq[Seq[Any]],
      table: Option[String] = None, sheet: String = "Sheet1"): String = {
    val dir = java.nio.file.Files.createTempDirectory("xlsx").toFile
    dir.deleteOnExit()
    val p = s"${dir.getAbsolutePath}/$name"
    Xlsx.Writer.write(p, rows, sheet, table)
    p
  }

  test("xlsx_table reads a named table with header and inferred types") {
    val p = tmpXlsx("t.xlsx", Seq(
      Seq("CategoryID", "Category", "Score", "Active"),
      Seq(1L, "Beginner", 1.5d, true),
      Seq(2L, "Advanced", 2.25d, false),
      Seq(3L, "Freestyle", -1.0d, true)), table = Some("dCategory"))
    val df = IoOps.xlsxTable(spark, p, "dCategory")
    assert(df.schema == StructType(Seq(
      StructField("CategoryID", LongType), StructField("Category", StringType),
      StructField("Score", DoubleType), StructField("Active", BooleanType))))
    val rows = df.orderBy("CategoryID").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    assert(rows.map(_.getString(1)).toSeq == Seq("Beginner", "Advanced", "Freestyle"))
    assert(rows.map(_.getDouble(2)).toSeq == Seq(1.5d, 2.25d, -1.0d))
    assert(rows.map(_.getBoolean(3)).toSeq == Seq(true, false, true))
  }

  test("xlsx_tables returns every table; missing names raise") {
    val p = tmpXlsx("t2.xlsx", Seq(Seq("a", "b"), Seq(1L, "x")), table = Some("tOne"))
    val all = IoOps.xlsxTables(spark, p)
    assert(all.keySet == Set("tOne"))
    intercept[NoSuchElementException] { IoOps.xlsxTables(spark, p, Seq("nope")) }
    val noTables = tmpXlsx("t3.xlsx", Seq(Seq("a"), Seq(1L)))
    intercept[IllegalArgumentException] { IoOps.xlsxTables(spark, noTables) }
  }

  test("xlsx_table with headerRowCount > 1 keeps rows after the first as data") {
    val dir = java.nio.file.Files.createTempDirectory("xlsx").toFile
    dir.deleteOnExit()
    val p = s"${dir.getAbsolutePath}/h2.xlsx"
    Xlsx.Writer.write(p, Seq(
      Seq("k", "v"),
      Seq("sub1", "sub2"), // second "header" row: the reference keeps it as data
      Seq("a", "b")), tableName = Some("t2h"), headerRowCount = 2)
    val rows = IoOps.xlsxTable(spark, p, "t2h").collect()
    assert(rows.length == 2)
    assert(rows.map(_.getString(0)).sorted.toSeq == Seq("a", "sub1"))
  }

  test("writer de-duplicates tableColumn names on header collisions") {
    // duplicate headers and a header colliding with the c<i> fallback must
    // still produce unique tableColumn names (OOXML uniqueness rule)
    val p = tmpXlsx("dup.xlsx", Seq(
      Seq("x", "x", null, "c3"),
      Seq(1L, 2L, 3L, 4L)), table = Some("tDup"))
    val zf = new java.util.zip.ZipFile(p)
    val entry = zf.getEntry("xl/tables/table1.xml")
    val xml = scala.io.Source.fromInputStream(zf.getInputStream(entry)).mkString
    zf.close()
    val names = """name="([^"]*)"""".r.findAllMatchIn(xml).map(_.group(1)).toSeq
      .filterNot(_ == "tDup") // table name/displayName attrs
    assert(names.size == 4)
    assert(names.distinct.size == 4, s"duplicate tableColumn names in $names")
    assert(names.head == "x")
    // the reader still maps data through positionally
    val df = IoOps.xlsxTable(spark, p, "tDup")
    assert(df.columns.length == 4)
    assert(df.count() == 1)
  }

  test("xlsx_cells yields one row per cell with coordinates and types") {
    val p = tmpXlsx("c.xlsx", Seq(
      Seq("Age", "Height"),
      Seq(1L, 2L),
      Seq(3.5d, null)), sheet = "highlights")
    val df = IoOps.xlsxCells(spark, p)
    val cells = df.orderBy("row", "column").collect()
    // null cells are simply absent from the xml (writer skips them)
    assert(cells.length == 5)
    val first = cells.head
    assert(first.getString(df.columns.indexOf("coordinate")) == "A1")
    assert(first.getString(df.columns.indexOf("value")) == "Age")
    assert(first.getString(df.columns.indexOf("data_type")) == "s")
    assert(first.getInt(df.columns.indexOf("row")) == 1)
    assert(first.getInt(df.columns.indexOf("column")) == 1)
    assert(!first.getBoolean(df.columns.indexOf("is_date")))
    assert(first.getString(df.columns.indexOf("sheetname")) == "highlights")
    val a3 = cells.find(_.getString(df.columns.indexOf("coordinate")) == "A3").get
    assert(a3.getString(df.columns.indexOf("data_type")) == "n")
    assert(a3.getString(df.columns.indexOf("value")) == "3.5")
    // integral numerics display without a trailing .0 (openpyxl parity)
    val a2 = cells.find(_.getString(df.columns.indexOf("coordinate")) == "A2").get
    assert(a2.getString(df.columns.indexOf("value")) == "1")
  }

  test("xlsx_cells start/end point bounds and sheet filter") {
    val p = tmpXlsx("c2.xlsx", Seq(Seq("a", "b"), Seq(1L, 2L), Seq(3L, 4L)))
    val sub = IoOps.xlsxCells(spark, p, startPoint = Some("A2"), endPoint = Some("A3"))
    assert(sub.select("coordinate").as[String].collect().sorted.toSeq == Seq("A2", "A3"))
    // unknown sheet names raise like the reference's wb[missing] KeyError
    intercept[NoSuchElementException] {
      IoOps.xlsxCells(spark, p, sheetnames = Seq("NoSuch"))
    }
    intercept[IllegalArgumentException] {
      IoOps.xlsxCells(spark, p, startPoint = Some("A1"))
    }
  }

  test("xlsx_cells exposes font/fill/border style attributes") {
    // hand-built workbook: the test Writer emits no styles.xml, so zip the
    // parts directly — two cellXfs (default; bold red on solid yellow with
    // a thin box border), cells B1/B2 using xf 1 via s="1"
    val styles =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">""" +
        """<fonts count="2">""" +
        """<font><sz val="11"/><name val="Calibri"/></font>""" +
        """<font><b/><i val="0"/><sz val="14"/><color rgb="FFFF0000"/><name val="Arial"/></font>""" +
        """</fonts>""" +
        """<fills count="3"><fill><patternFill patternType="none"/></fill>""" +
        """<fill><patternFill patternType="gray125"/></fill>""" +
        """<fill><patternFill patternType="solid"><fgColor rgb="FFFFFF00"/></patternFill></fill></fills>""" +
        """<borders count="2"><border><left/><right/><top/><bottom/><diagonal/></border>""" +
        """<border><left style="thin"/><right style="thin"/><top style="medium"/><bottom/><diagonal/></border></borders>""" +
        """<cellXfs count="2">""" +
        """<xf numFmtId="0" fontId="0" fillId="0" borderId="0"/>""" +
        """<xf numFmtId="0" fontId="1" fillId="2" borderId="1"/>""" +
        """</cellXfs></styleSheet>"""
    val sheet =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""" +
        """<row r="1"><c r="A1" t="inlineStr"><is><t>plain</t></is></c>""" +
        """<c r="B1" s="1" t="inlineStr"><is><t>styled</t></is></c></row>""" +
        """<row r="2"><c r="B2" s="1"><v>7</v></c></row>""" +
        """</sheetData></worksheet>"""
    val parts = Seq(
      "_rels/.rels" ->
        ("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
          """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
          """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/></Relationships>"""),
      "xl/workbook.xml" ->
        ("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
          """<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">""" +
          """<sheets><sheet name="S" sheetId="1" r:id="rId1"/></sheets></workbook>"""),
      "xl/_rels/workbook.xml.rels" ->
        ("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
          """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
          """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/></Relationships>"""),
      "xl/styles.xml" -> styles,
      "xl/worksheets/sheet1.xml" -> sheet)
    val dir = java.nio.file.Files.createTempDirectory("xlsxstyle").toFile
    dir.deleteOnExit()
    val path = s"$dir/styled.xlsx"
    val zos = new java.util.zip.ZipOutputStream(new java.io.FileOutputStream(path))
    parts.foreach { case (n, c) =>
      zos.putNextEntry(new java.util.zip.ZipEntry(n))
      zos.write(c.getBytes("UTF-8")); zos.closeEntry()
    }
    zos.close()
    val df = IoOps.xlsxCells(spark, path)
    def cell(coord: String) =
      df.filter($"coordinate" === coord).collect()(0)
    val plain = cell("A1")
    assert(plain.getString(df.columns.indexOf("font_name")) == "Calibri")
    assert(!plain.getBoolean(df.columns.indexOf("font_bold")))
    assert(plain.getString(df.columns.indexOf("fill_pattern")) == "none")
    assert(plain.getString(df.columns.indexOf("border")) == "")
    val styled = cell("B1")
    assert(styled.getString(df.columns.indexOf("font_name")) == "Arial")
    assert(styled.getString(df.columns.indexOf("font_size")) == "14")
    assert(styled.getBoolean(df.columns.indexOf("font_bold")))
    assert(!styled.getBoolean(df.columns.indexOf("font_italic"))) // i val="0"
    assert(styled.getString(df.columns.indexOf("fill_pattern")) == "solid")
    assert(styled.getString(df.columns.indexOf("fill_fg_color")) == "FFFFFF00")
    assert(styled.getString(df.columns.indexOf("border")) == "left:thin;right:thin;top:medium")
    assert(cell("B2").getString(df.columns.indexOf("font_name")) == "Arial")
  }

  test("styled writer round-trips through the openpyxl-named style structs") {
    val dir = java.nio.file.Files.createTempDirectory("xlsxstyled").toFile
    dir.deleteOnExit()
    val p = s"$dir/styled_writer.xlsx"
    graft.sources.Xlsx.Writer.write(p,
      Seq(Seq[Any]("h1", "h2"), Seq[Any](1L, "x"), Seq[Any](2L, "y")),
      styledHeader = true)
    val df = IoOps.xlsxCells(spark, p)
    def cell(coord: String) = df.filter($"coordinate" === coord).collect()(0)
    val hdr = cell("A1")
    val font = hdr.getStruct(df.columns.indexOf("font"))
    assert(font.getString(0) == "Arial" && font.getString(1) == "14")
    assert(font.getBoolean(2) && !font.getBoolean(3)) // bold, not italic
    assert(font.getString(4) == "FFFF0000")
    val fill = hdr.getStruct(df.columns.indexOf("fill"))
    assert(fill.getString(0) == "solid" && fill.getString(1) == "FFFFFF00")
    val sides = hdr.getStruct(df.columns.indexOf("border_sides"))
    assert(sides.getString(0) == "thin" && sides.getString(2) == "medium")
    assert(sides.isNullAt(3)) // no bottom style
    val data = cell("A2")
    assert(data.getStruct(df.columns.indexOf("font")).getString(0) == "Calibri")
    assert(data.getStruct(df.columns.indexOf("fill")).getString(0) == "none")
    // the styles part is reachable via the workbook relationships, not just
    // by hardcoded part name (conformant-consumer contract)
    val zf = new java.util.zip.ZipFile(p)
    try {
      val rels = new String(zf.getInputStream(
        zf.getEntry("xl/_rels/workbook.xml.rels")).readAllBytes(), "UTF-8")
      assert(rels.contains("relationships/styles") && rels.contains("styles.xml"))
    } finally zf.close()
  }

  test("readCsvsSeparate returns one frame per file keyed by basename") {
    val dir = java.nio.file.Files.createTempDirectory("csvsep").toFile
    dir.deleteOnExit()
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/a.csv"), "k,v\n1,x\n")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/b.csv"), "k,v\n2,y\n3,z\n")
    val m = IoOps.readCsvsSeparate(spark, s"$dir/*.csv",
      schema = Some("k INT, v STRING"))
    assert(m.keySet == Set("a.csv", "b.csv"))
    assert(m("a.csv").count() == 1 && m("b.csv").count() == 2)
    intercept[IllegalArgumentException] {
      IoOps.readCsvsSeparate(spark, s"$dir/*.tsv")
    }
  }

  test("xlsx_cells_glob parses a directory of workbooks in executors") {
    val dir = java.nio.file.Files.createTempDirectory("xlsxglob").toFile
    dir.deleteOnExit()
    Xlsx.Writer.write(s"$dir/one.xlsx", Seq(Seq("k", "v"), Seq(1L, "a")))
    Xlsx.Writer.write(s"$dir/two.xlsx", Seq(Seq("k", "v"), Seq(2L, "b")))
    val df = IoOps.xlsxCellsGlob(spark, s"$dir/*.xlsx")
    assert(df.count() == 8)
    assert(df.select("source_file").distinct().count() == 2)
    val vals = df.filter($"data_type" === "n").select("value")
      .as[String].collect().sorted.toSeq
    assert(vals == Seq("1", "2"))
  }

  test("date-formatted serials convert with the 1900 leap bug accounted for") {
    // serial 45292 = 2024-01-01 in the 1900 date system
    assert(Xlsx.serialToIso(45292d) == "2024-01-01")
    assert(Xlsx.serialToIso(45292.5d) == "2024-01-01 12:00")
    // serials below 60 predate the phantom 1900-02-29
    assert(Xlsx.serialToIso(1d) == "1900-01-01")
    // a fraction that rounds to a full day rolls the date, not the clock
    assert(Xlsx.serialToIso(45292.9999999d) == "2024-01-02")
    assert(Xlsx.isDateFormat("yyyy-mm-dd"))
    assert(Xlsx.isDateFormat("m/d/yy h:mm"))
    assert(!Xlsx.isDateFormat("General"))
    assert(!Xlsx.isDateFormat("0.00"))
    assert(!Xlsx.isDateFormat("\"yes\"0.0"))
  }

  test("coordinate helpers round-trip") {
    assert(Xlsx.parseCoord("BC23", 0) == (55, 23))
    assert(Xlsx.colLetters(55) == "BC")
    assert(Xlsx.colLetters(1) == "A")
    assert(Xlsx.colLetters(27) == "AA")
    assert(Xlsx.parseRef("A1:C6") == (1, 1, 3, 6))
    // single-cell tables may carry a colon-less ref
    assert(Xlsx.parseRef("B7") == (2, 7, 2, 7))
  }
}
