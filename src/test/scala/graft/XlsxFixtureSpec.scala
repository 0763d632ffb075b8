package graft

import graft.sources.IoOps

/** The reference's OWN xlsx fixtures read by our JDK-only OOXML parser
  * (reference: tests/io/test_xlsx_table.py over
  * tests/test_data/016-MSPTDA-Excel.xlsx and excel_without_headers.xlsx).
  * Expected values were extracted INDEPENDENTLY with a raw zip+XML walk
  * (python stdlib, no openpyxl, no code shared with Xlsx.scala), so the
  * assertions are real third-party ground truth, not a parser echo.
  */
class XlsxFixtureSpec extends SparkSpec {

  private val fixture = "/root/reference/tests/test_data/016-MSPTDA-Excel.xlsx"
  private val noHeaders = "/root/reference/tests/test_data/excel_without_headers.xlsx"

  test("dCategory: 5 rows, inferred integer ids") {
    val df = IoOps.xlsxTable(spark, fixture, "dCategory")
    assert(df.columns.toSeq == Seq("CategoryID", "Category"))
    val rows = df.collect().map(r => (r.get(0).toString, r.getString(1))).toSeq
    assert(rows == Seq("1" -> "Beginner", "2" -> "Advanced", "3" -> "Freestyle",
      "4" -> "Competition", "5" -> "Long Distance"))
  }

  test("dSupplier: header row + 4 data rows with e-mail strings") {
    val df = IoOps.xlsxTable(spark, fixture, "dSupplier")
    assert(df.columns.toSeq == Seq("SupplierID", "Supplier", "City", "State", "E-mail"))
    val rows = df.collect().map(r => (0 until 5).map(r.getString).toList).toSeq
    assert(rows.head == List("GB", "Gel Boomerangs", "Oakland", "CA",
      "gel@gel-boomerang.com"))
    assert(rows.last == List("DB", "Darnell Booms", "Burlington", "VT",
      "Darnell@Darnell.com"))
    assert(rows.length == 4)
  }

  test("dSalesReps: 25 rows, first and last pinned") {
    val df = IoOps.xlsxTable(spark, fixture, "dSalesReps")
    assert(df.columns.toSeq == Seq("SalesRepID", "SalesRep", "Region"))
    val rows = df.collect()
      .map(r => (r.get(0).toString, r.getString(1), r.getString(2))).toSeq
    assert(rows.length == 25)
    assert(rows.head == (("1", "Sioux Radcoolinator", "NW")))
    assert(rows.last == (("25", "Kiki Lim", "W")))
  }

  test("dProduct: mixed long/double/string inference") {
    val df = IoOps.xlsxTable(spark, fixture, "dProduct")
    assert(df.columns.toSeq ==
      Seq("ProductID", "Products", "RetailPrice", "CategoryID", "SupplierID"))
    val rows = df.collect().map(r => (r.get(0).toString, r.getString(1),
      r.get(2).toString.toDouble, r.get(3).toString, r.getString(4))).toSeq
    assert(rows.length == 16)
    assert(rows.head == (("1", "Quad", 43.95, "3", "GB")))
    assert(rows.last == (("16", "LongRang", 41.0, "5", "CC")))
  }

  test("headerRowCount=0 tables get C0..Cn names (excel_without_headers)") {
    val df = IoOps.xlsxTable(spark, noHeaders, "dSalesReps")
    assert(df.columns.toSeq == Seq("C0", "C1", "C2"))
    assert(df.count() == 25)
    val first = df.collect().head
    assert(first.get(0).toString == "1" && first.getString(1) == "Sioux Radcoolinator")
  }

  test("xlsx_cells inventories the tidyxl worked-examples fixture") {
    // reference: tests/io/test_tidyxl.py over worked-examples.xlsx; counts
    // and spot values from the independent raw-XML walk
    val worked = "/root/reference/tests/test_data/worked-examples.xlsx"
    val clean = IoOps.xlsxCells(spark, worked, sheetnames = Seq("clean"))
    val idx = clean.columns.zipWithIndex.toMap
    val rows = clean.orderBy("row", "column").collect()
    assert(rows.length == 8)
    assert(rows.head.getString(idx("coordinate")) == "A1" &&
      rows.head.getString(idx("value")) == "Name")
    assert(rows.map(_.getString(idx("value"))).toSeq ==
      Seq("Name", "Age", "Matilda", "1", "Nicholas", "3", "Olivia", "5"))
    // pivot-notes: 32 cells in the XML including explicitly-blank ones
    val pn = IoOps.xlsxCells(spark, worked, sheetnames = Seq("pivot-notes"))
    assert(pn.count() == 32)
    assert(pn.filter(org.apache.spark.sql.functions.col("coordinate") === "G2")
      .collect().head.getString(idx("value")) == "0 = absent")
    val pnNoBlanks = IoOps.xlsxCells(spark, worked,
      sheetnames = Seq("pivot-notes"), includeBlankCells = false)
    assert(pnNoBlanks.count() < 32)
    // sheet selection is exact: all 25 sheets when none named
    val all = IoOps.xlsxCells(spark, worked)
    assert(all.select("sheetname").distinct().count() == 25)
  }

  test("multi-table and all-tables forms match the reference dict contract") {
    val some = IoOps.xlsxTables(spark, fixture, Seq("dSalesReps", "dSupplier"))
    assert(some.keySet == Set("dSalesReps", "dSupplier"))
    val all = IoOps.xlsxTables(spark, fixture)
    assert(all.keySet == Set("dSalesReps", "dSupplier", "dProduct", "dCategory"))
    // missing table raises, like the reference KeyError
    intercept[NoSuchElementException](
      IoOps.xlsxTables(spark, fixture, Seq("nope")))
  }
}
