package graft

import graft.ColumnSelector._
import graft.syntax._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class SelectorAndFilterSpec extends SparkSpec {
  import spark.implicits._

  lazy val df = Seq((1L, 1.5, "x", true)).toDF("id_key", "val_a", "val_b", "flag")

  test("selector DSL: glob, regex, slice, dtype, not, union, invert") {
    val schema = df.schema
    assert(resolve(schema, Seq(glob("val_*"))) == Seq("val_a", "val_b"))
    assert(resolve(schema, Seq(rx("^id"))) == Seq("id_key"))
    assert(resolve(schema, Seq(Slice("val_a", "flag"))) == Seq("val_a", "val_b", "flag"))
    assert(resolve(schema, Seq(ofType(BooleanType))) == Seq("flag"))
    assert(resolve(schema, Seq(numeric)) == Seq("id_key", "val_a"))
    assert(resolve(schema, Seq(Not(glob("val_*")))) == Seq("id_key", "flag"))
    assert(resolve(schema, Seq(Any(Seq(Exact("flag"), glob("id*"))))) == Seq("flag", "id_key"))
    assert(resolve(schema, Seq(glob("val_*")), invert = true) == Seq("id_key", "flag"))
    // every no-match raises the SAME exception type, like the reference's
    // single KeyError; predicates may legitimately select nothing
    intercept[NoSuchElementException](resolve(schema, Seq(Exact("nope"))))
    intercept[NoSuchElementException](resolve(schema, Seq(glob("zz*"))))
    intercept[NoSuchElementException](resolve(schema, Seq(rx("^zz"))))
    assert(resolve(schema, Seq(ofType(org.apache.spark.sql.types.DateType))).isEmpty)
  }

  test("filterDate: the reference's 1000-day frame, all parameter forms") {
    // tests/functions/test_filter_date.py over the contiguous 1000 days
    // starting 2019-01-28 (janitor/testing_utils/date_data.py), dates as
    // MM/dd/yy strings like the fixture
    import graft.syntax._
    val fmtOut = java.time.format.DateTimeFormatter.ofPattern("MM/dd/yy")
    val d0 = java.time.LocalDate.of(2019, 1, 28)
    val dates = (0 until 1000).map(i => d0.plusDays(i).format(fmtOut))
    val df = dates.zipWithIndex.map { case (s, i) => (i, s) }.toDF("AMOUNT", "DATE")
    val fmt = Some("MM/dd/yy")
    val colFmt = Seq("MM/dd/yy") // the column_date_options analog
    def years(df2: org.apache.spark.sql.DataFrame) = df2
      .select(org.apache.spark.sql.functions.year(
        org.apache.spark.sql.functions.to_timestamp(col("DATE"), "MM/dd/yy")))
      .distinct().collect().map(_.getInt(0)).toSet
    assert(years(df.filterDate("DATE", years = Seq(2020),
      columnFormats = colFmt)) == Set(2020))
    assert(years(df.filterDate("DATE", years = Seq(2020, 2021),
      columnFormats = colFmt)) == Set(2020, 2021))
    // months 10-11 only
    val m = df.filterDate("DATE", months = Seq(10, 11), columnFormats = colFmt)
      .select(org.apache.spark.sql.functions.month(
        org.apache.spark.sql.functions.to_timestamp(col("DATE"), "MM/dd/yy")))
      .distinct().collect().map(_.getInt(0)).toSet
    assert(m == Set(10, 11))
    // days 1-4 only
    val dd = df.filterDate("DATE", days = (1 to 4), columnFormats = colFmt)
      .select(org.apache.spark.sql.functions.dayofmonth(
        org.apache.spark.sql.functions.to_timestamp(col("DATE"), "MM/dd/yy")))
      .distinct().collect().map(_.getInt(0)).toSet
    assert(dd == Set(1, 2, 3, 4))
    // start_date drops everything <= 01/31/19
    assert(df.filterDate("DATE", startDate = Some("02/01/19"), format = fmt,
      columnFormats = colFmt).count() == 1000 - 4)
    // start+end inclusive window of two days
    assert(df.filterDate("DATE", startDate = Some("02/01/19"),
      endDate = Some("02/02/19"), format = fmt, columnFormats = colFmt)
      .count() == 2)
    // test_filter_different_date_format: `format` parses ONLY the end bound
    // (filter.py:234-238); the column keeps its own MM/dd/yy parse
    assert(df.filterDate("DATE", endDate = Some("01@@@@29@@@@19"),
      format = Some("MM@@@@dd@@@@yy"), columnFormats = colFmt).count() == 2)
    // test_column_date_options: dayfirst=True is a per-value HINT — values
    // whose day-first read is invalid (month > 12) fall back; the reference
    // expects exactly 13 rows <= 01/29/19 under that misreading
    assert(df.filterDate("DATE", endDate = Some("01/29/19"), format = fmt,
      columnFormats = Seq("dd/MM/yy", "MM/dd/yy")).count() == 13)
  }

  test("getIndexLabels returns matched names; getColumns groups a DSL projection") {
    assert(df.getIndexLabels(glob("val_*")) == Seq("val_a", "val_b"))
    val d = Seq(("a", 1.0, 2.0, "z"), ("a", 3.0, 4.0, "z")).toDF("g", "m_x", "m_y", "other")
    val out = d.getColumns(Seq("g"), glob("m_*")).sum()
    assert(out.columns.toSeq == Seq("g", "sum(m_x)", "sum(m_y)"))
    assert(out.collect()(0).getDouble(1) == 4.0)
  }

  test("filterString: contains, case-insensitive, complement, na default") {
    val d = Seq(Some("Apple"), Some("banana"), None).toDF("s")
    assert(d.filterString("s", "apple", regex = false, caseSensitive = false).count() == 1)
    assert(d.filterString("s", "^ban").count() == 1)
    // complement keeps the null row only when naDefault treats null as match=false
    assert(d.filterString("s", "apple", regex = false, caseSensitive = false,
      complement = true).count() == 2)
    assert(d.filterString("s", "apple", naDefault = true, regex = false,
      caseSensitive = false).count() == 2)
  }

  test("updateWhere updates existing columns in place") {
    val d = Seq((1, 10), (2, 20)).toDF("k", "v")
    val out = d.updateWhere("k = 1", "v", 99).collect().map(r => (r.getInt(0), r.getInt(1))).toMap
    assert(out == Map(1 -> 99, 2 -> 20))
  }

  test("dropDuplicateColumns drops only the nth occurrence (reference matrix)") {
    // tests/functions/test_drop_duplicate_columns.py: the pandas fixture has
    // columns a,b,a,a after clean_names(remove_special); built positionally
    // here since toDF allows duplicate labels
    def dup = Seq((0, 0, 10, 20), (1, 1, 11, 21)).toDF("a", "b", "a", "a")
    // default nth_index=0 drops the FIRST a -> b, a(=A), a(=a*)
    val d0 = dup.dropDuplicateColumns("a")
    assert(d0.columns.toSeq == Seq("b", "a", "a"))
    assert(d0.orderBy(col("b")).collect()(0).toSeq == Seq(0, 10, 20))
    // nth_index=1 drops the SECOND a -> a, b, a(=a*)
    val d1 = dup.dropDuplicateColumns("a", nth = 1)
    assert(d1.columns.toSeq == Seq("a", "b", "a"))
    assert(d1.orderBy(col("b")).collect()(0).toSeq == Seq(0, 0, 20))
    // nth_index=2 drops the THIRD -> a, b, a(=A)
    val d2 = dup.dropDuplicateColumns("a", nth = 2)
    assert(d2.columns.toSeq == Seq("a", "b", "a"))
    assert(d2.orderBy(col("b")).collect()(0).toSeq == Seq(0, 0, 10))
    // out-of-range nth raises like the reference IndexError
    intercept[IllegalArgumentException](dup.dropDuplicateColumns("a", nth = 3))
  }

  test("dropConstantColumns: nunique==1 drops; all-null survives (pandas parity)") {
    // empirically verified against the reference: nunique() counts distinct
    // NON-null values, so an all-null column (nunique 0) is KEPT and a
    // constant-with-gaps column (nunique 1) is DROPPED
    val d = Seq((1, 7, Option.empty[Int]), (2, 7, None)).toDF("a", "b", "c")
    assert(d.dropConstantColumns().columns.toSeq == Seq("a", "c"))
    val gaps = Seq((1, Some(5.0)), (2, None), (3, Some(5.0))).toDF("a", "g")
    assert(gaps.dropConstantColumns().columns.toSeq == Seq("a"))
    // double NaN counts as missing, like pandas isna
    val nans = Seq((1, 5.0), (2, Double.NaN), (3, 5.0)).toDF("a", "g")
    assert(nans.dropConstantColumns().columns.toSeq == Seq("a"))
  }

  test("moveColumn before/after") {
    val d = Seq((1, 2, 3)).toDF("a", "b", "c")
    assert(d.moveColumn("c", "a", "before").columns.toSeq == Seq("c", "a", "b"))
    assert(d.moveColumn("a", "b", "after").columns.toSeq == Seq("b", "a", "c"))
  }
}
