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
