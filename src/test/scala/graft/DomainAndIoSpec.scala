package graft

import graft.operators.DomainOps
import graft.sources.IoOps
import org.apache.spark.sql.functions._

class DomainAndIoSpec extends SparkSpec {
  import spark.implicits._

  test("convertUnits handles linear and affine conversions") {
    val d = Seq(100.0).toDF("v")
    val f = DomainOps.convertUnits(d, "v", "C", "F").collect()(0).getDouble(0)
    assert(math.abs(f - 212.0) < 1e-9)
    val lb = DomainOps.convertUnits(d, "v", "kg", "lb").collect()(0).getDouble(0)
    assert(math.abs(lb - 220.462262) < 1e-4)
    intercept[IllegalArgumentException](DomainOps.convertUnits(d, "v", "kg", "C"))
    // reference value cases: cm -> m, same-unit identity, unknown units
    // raise even when from == to (pint UndefinedUnitError)
    val m = DomainOps.convertUnits(d, "v", "cm", "m", Some("v_m"))
      .collect()(0).getDouble(1)
    assert(math.abs(m - 1.0) < 1e-12)
    val same = DomainOps.convertUnits(d, "v", "cm", "cm", Some("v_cm"))
      .collect()(0)
    assert(same.getDouble(0) == same.getDouble(1))
    intercept[IllegalArgumentException](
      DomainOps.convertUnits(d, "v", "furlong", "furlong"))
  }

  test("inflateCurrency multiplies by the CPI ratio") {
    val d = Seq(100.0).toDF("v")
    val out = DomainOps.inflateCurrency(d, "v", "USA", 2010, 2020).collect()(0).getDouble(0)
    assert(math.abs(out - 100.0 * math.pow(1.021, 10)) < 1e-9)
  }

  test("inflateCurrency: the reference's full error + naming contract") {
    // golden port of tests/finance/test_inflate_currency.py against the
    // static CPI snapshot (the WB API stand-in)
    val d = Seq(100.0).toDF("a")
    // same-year inflator is exactly 1; make_new_column appends a_2018
    val same = DomainOps.inflateCurrency(d, "a", "USA", 2018, 2018,
      makeNewColumn = true)
    assert(same.columns.toSeq == Seq("a", "a_2018"))
    val r = same.collect()(0)
    assert(r.getDouble(0) == r.getDouble(1))
    // full country name resolves through wb_country_dict
    // (test_expected_result_with_full_country_name)
    assert(DomainOps.inflationFactor("United States", 2018, 2015) ==
      DomainOps.inflationFactor("USA", 2018, 2015))
    // invalid country (test_wb_country_check)
    intercept[IllegalArgumentException](
      DomainOps.inflateCurrency(d, "a", "INVALID-COUNTRY", 2018, 2018))
    // year floor (test_year_check: currency_year=1950)
    intercept[IllegalArgumentException](
      DomainOps.inflateCurrency(d, "a", "USA", 1950, 2018))
    // years past the snapshot (test_api_result_check: 2030/2050)
    intercept[IllegalArgumentException](
      DomainOps.inflateCurrency(d, "a", "USA", 2030, 2050))
    // per-country series coverage: GHA's CPI starts 1964, so 1962 raises on
    // either side (test_to_year_available / test_currency_year_available)
    intercept[IllegalArgumentException](
      DomainOps.inflationFactor("GHA", 2010, 1962))
    intercept[IllegalArgumentException](
      DomainOps.inflationFactor("GHA", 1962, 2010))
    assert(DomainOps.inflationFactor("Ghana", 1964, 2010) > 0)
    // abbreviation-only labels (no full name) still validate
    assert(DomainOps.inflationFactor("EMU", 2000, 2001) > 0)
  }

  test("checkCurrency enforces the reference currency whitelist") {
    DomainOps.checkCurrency("USD")
    DomainOps.checkCurrency("ZAR")
    assert(DomainOps.currencySet.size == 33) // the reference's exact set
    intercept[IllegalArgumentException](DomainOps.checkCurrency("XYZ"))
    intercept[IllegalArgumentException](DomainOps.checkCurrency("usd"))
  }

  test("wbCountryDict carries the reference's full World Bank whitelist") {
    assert(DomainOps.wbCountryDict.size == 264)
    assert(DomainOps.wbCountryDict("United States") == "USA")
    assert(DomainOps.wbCountryDict("Korea, Rep.") == "KOR")
    assert(DomainOps.checkWbCountry("CHE") == "CHE")
    assert(DomainOps.checkWbCountry("Switzerland") == "CHE")
    intercept[IllegalArgumentException](DomainOps.checkWbCountry("Atlantis"))
    intercept[IllegalArgumentException](DomainOps.checkWbYears(1959))
  }

  test("convertCurrency raises like the deprecated reference stub") {
    intercept[UnsupportedOperationException](DomainOps.convertCurrency())
  }

  test("joinFasta maps ids to concatenated sequence lines") {
    val path = java.io.File.createTempFile("test", ".fasta", new java.io.File("target"))
    java.nio.file.Files.writeString(path.toPath, ">a desc\nAC\nGT\n>b\nTT\n")
    val d = Seq("a", "b", "c").toDF("sid")
    val out = DomainOps.joinFasta(spark, d, "sid", path.getAbsolutePath, "seq")
      .orderBy("sid").collect().map(r => if (r.isNullAt(1)) null else r.getString(1)).toSeq
    assert(out == Seq("ACGT", "TT", null))
  }

  test("getFeaturesTargets splits columns") {
    val d = Seq((1, 2.0, "y")).toDF("f1", "f2", "target")
    val (x, y) = DomainOps.getFeaturesTargets(d, Seq("target"))
    assert(x.columns.toSeq == Seq("f1", "f2") && y.columns.toSeq == Seq("target"))
  }

  test("readCommandline parses shell stdout as CSV") {
    val out = IoOps.readCommandline(spark, "printf 'a,b\\n1,x\\n'",
      schema = Some("a INT, b STRING")).collect()(0)
    assert(out.getInt(0) == 1 && out.getString(1) == "x")
  }

  test("readCsvs reads a glob with schema and source tagging") {
    val dir = new java.io.File("target/tmp/readcsvs_spec")
    dir.mkdirs()
    java.nio.file.Files.writeString(new java.io.File(dir, "a.csv").toPath, "k,v\n1,x\n")
    java.nio.file.Files.writeString(new java.io.File(dir, "b.csv").toPath, "k,v\n2,y\n")
    val out = IoOps.readCsvs(spark, dir.getAbsolutePath + "/*.csv",
      schema = Some("k INT, v STRING"), withSourceFile = true)
    assert(out.count() == 2)
    assert(out.columns.toSeq == Seq("k", "v", "source_file"))
  }

  test("readCsvs raises on empty globs and mismatched headers (test_read_csvs)") {
    // test_read_csvs_zero_csv_path: no files -> raise
    intercept[IllegalArgumentException](
      IoOps.readCsvs(spark, "target/tmp/nofilesondisk_*.csv"))
    // test_read_csvs_two_unmatching_csv_files: differing headers -> raise
    val dir = new java.io.File("target/tmp/readcsvs_mismatch")
    dir.mkdirs()
    java.nio.file.Files.writeString(new java.io.File(dir, "f0.csv").toPath, "a,b,c\n1,2,3\n")
    java.nio.file.Files.writeString(new java.io.File(dir, "f1.csv").toPath, "d,e,f\n1,2,3\n")
    val err = intercept[IllegalArgumentException](
      IoOps.readCsvs(spark, dir.getAbsolutePath + "/*.csv"))
    assert(err.getMessage.contains("header mismatch"))
    // matching headers still read fine without an explicit schema
    java.nio.file.Files.writeString(new java.io.File(dir, "f1.csv").toPath, "a,b,c\n4,5,6\n")
    assert(IoOps.readCsvs(spark, dir.getAbsolutePath + "/*.csv").count() == 2)
  }

  test("xlsx readers raise on a missing file") {
    intercept[Exception](IoOps.xlsxTable(spark, "target/tmp/nope.xlsx", "t"))
    intercept[Exception](IoOps.xlsxCells(spark, "target/tmp/nope.xlsx"))
  }

  test("getSymbol broadcast-joins the static ticker table") {
    val d = Seq("AAPL", "ZZZZ").toDF("tick")
    val out = DomainOps.getSymbol(spark, d, "tick").orderBy("tick")
      .collect().map(r => (r.getString(0), if (r.isNullAt(1)) null else r.getString(1))).toSeq
    assert(out == Seq(("AAPL", "Apple Inc."), ("ZZZZ", null)))
  }
}
