package graft

import graft.RowSelector._
import graft.operators.SelectOps
import org.apache.spark.sql.functions._

/** Golden port of tests/functions/test_select_rows.py — the row-axis DSL
  * value cases the r15 verdict flagged as unswept. Pandas fixtures map to
  * explicit index columns: `dates` is the BME-2011 DatetimeIndex, `numbers`
  * the 0..19 RangeIndex, `multi` the (first, second) MultiIndex.
  */
class SelectRowsSpec extends SparkSpec {
  import spark.implicits._

  // pd.date_range("2011-01-01", "2012-01-01", freq="BME") — last business
  // day of each month of 2011
  private val bme = Seq(
    "2011-01-31", "2011-02-28", "2011-03-31", "2011-04-29", "2011-05-31",
    "2011-06-30", "2011-07-29", "2011-08-31", "2011-09-30", "2011-10-31",
    "2011-11-30", "2011-12-30")
  private def dates = bme.zipWithIndex
    .map { case (d, i) => (java.sql.Date.valueOf(d), i * 1.5) }
    .toDF("dt", "numbers")
  private def numbers = (0 until 20).map(i => (i, i * 0.25)).toDF("idx", "num")
  private def multi = Seq(
    ("bar", "one", 1.0), ("bar", "two", 2.0), ("baz", "one", 3.0),
    ("baz", "two", 4.0), ("foo", "one", 5.0), ("foo", "two", 6.0),
    ("qux", "one", 7.0), ("qux", "two", 8.0)).toDF("first", "second", "v")

  private def dts(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.orderBy("dt").collect().map(_.getDate(0).toString).toSeq

  test("missing labels raise the reference's KeyError analogs") {
    // test_number_not_found_index / test_string_not_found_numeric_index
    intercept[NoSuchElementException](
      SelectOps.selectRows(numbers, "idx", Label(2.5)))
    intercept[NoSuchElementException](
      SelectOps.selectRows(numbers, "idx", Label("2.5")))
    // test_date_not_found — 2011-01-02 is not a BME date
    intercept[NoSuchElementException](
      SelectOps.selectRows(dates, "dt", Label("2011-01-02")))
    intercept[NoSuchElementException](
      SelectOps.selectRows(dates, "dt", DateStr("2011-01-02")))
    // test_tuple_not_found — ("one", "bar") reversed levels matches nothing
    intercept[NoSuchElementException](
      SelectOps.selectRows(multi, "first",
        Levels(Map("first" -> Seq("one"), "second" -> Seq("bar")))))
    // test_list_not_found / test_missing_some_array — ANY missing label raises
    intercept[NoSuchElementException](
      SelectOps.selectRows(numbers, "idx", Labels(Seq(2.5, 3))))
    intercept[NoSuchElementException](
      SelectOps.selectRows(numbers, "idx", Labels(Seq(2.5, 3.7))))
  }

  test("regex selection: contains semantics, string index only, raise on no match") {
    // test_regex_not_found_string_index — none of bar/baz/foo/qux contains t.+
    intercept[NoSuchElementException](
      SelectOps.selectRows(multi, "first", Rx("t.+".r)))
    // test_regex_not_found_numeric_index — pandas index.str fails on a
    // numeric index and select.py:513 wraps it in the same KeyError
    intercept[NoSuchElementException](
      SelectOps.selectRows(numbers, "idx", Rx(".+".r)))
    val hit = SelectOps.selectRows(multi, "first", Rx("ba.".r))
    assert(hit.select("first").distinct().collect().map(_.getString(0)).toSet ==
      Set("bar", "baz"))
  }

  test("partial date strings select periods (test_date_partial/actual_output)") {
    assert(SelectOps.selectRows(dates, "dt", Label("2011")).count() == 12)
    assert(dts(SelectOps.selectRows(dates, "dt", Label("2011-01-31"))) ==
      Seq("2011-01-31"))
    assert(dts(SelectOps.selectRows(dates, "dt", DateStr("2011-02"))) ==
      Seq("2011-02-28"))
    // test_set — a one-element set of exact labels
    assert(dts(SelectOps.selectRows(dates, "dt",
      Labels(Seq("2011-01-31")))) == Seq("2011-01-31"))
  }

  test("label slices are inclusive; date-string bounds resolve as periods") {
    // test_slice_dates
    assert(dts(SelectOps.selectRows(dates, "dt",
      LabelSlice(Some("2011-01-31"), Some("2011-03-31")))) ==
      Seq("2011-01-31", "2011-02-28", "2011-03-31"))
    // test_slice_dates_inexact — stop "2011-03" keeps ALL of March
    assert(dts(SelectOps.selectRows(dates, "dt",
      LabelSlice(Some("2011-01"), Some("2011-03")))) ==
      Seq("2011-01-31", "2011-02-28", "2011-03-31"))
    // test_slice1 — slice(None, None) is the whole frame
    assert(SelectOps.selectRows(dates, "dt", LabelSlice()).count() == 12)
    // test_slice2 — slice(None, None, 2) is every 2nd row positionally
    assert(dts(SelectOps.selectRows(dates, "dt", LabelSlice(step = 2))) ==
      Seq("2011-01-31", "2011-03-31", "2011-05-31", "2011-07-29",
        "2011-09-30", "2011-11-30"))
    // step within a bounded region ranks inside the region, not globally
    assert(dts(SelectOps.selectRows(dates, "dt",
      LabelSlice(Some("2011-02"), Some("2011-06"), step = 2))) ==
      Seq("2011-02-28", "2011-04-29", "2011-06-30"))
  }

  test("boolean masks are positional in index order with strict length") {
    // test_boolean_list_uneven_length
    intercept[IllegalArgumentException](
      SelectOps.selectRows(dates, "dt", BoolMask(Seq(true, false))))
    // test_array_bool — [True]*6 + [False]*6 keeps Jan..Jun
    val mask = Seq.fill(6)(true) ++ Seq.fill(6)(false)
    assert(dts(SelectOps.selectRows(dates, "dt", BoolMask(mask))) ==
      bme.take(6))
    // inverted mask keeps Jul..Dec
    assert(dts(SelectOps.selectRows(dates, "dt", BoolMask(mask),
      invert = true)) == bme.drop(6))
  }

  test("callable form filters on a built predicate (test_callable)") {
    assert(dts(SelectOps.selectRows(dates, "dt",
      Where(d => month(col("dt")) === 4))) == Seq("2011-04-29"))
  }

  test("dict/tuple forms over a multi-column index (test_dict, test_multiindex_tuple_present)") {
    val tup = SelectOps.selectRows(multi, "first",
      Levels(Map("first" -> Seq("bar"), "second" -> Seq("one"))))
    assert(tup.collect().map(_.getDouble(2)).toSeq == Seq(1.0))
    val dict = SelectOps.selectRows(multi, "first",
      Levels(Map("first" -> Seq("bar", "qux"), "second" -> Seq("two"))))
    assert(dict.orderBy("first").collect().map(_.getDouble(2)).toSeq ==
      Seq(2.0, 8.0))
  }

  test("invert drops the matched rows (test_invert_num)") {
    val out = SelectOps.selectRows(numbers, "idx", Labels(Seq(4, 6, 10)),
      invert = true)
    assert(out.count() == 17)
    assert(out.filter(col("idx").isin(4, 6, 10)).count() == 0)
  }

  test("moveRows repositions labeled rows (test_move.py:11-94, axis=0)") {
    import graft.syntax._
    val df = Seq(("a", 1), ("b", 2), ("c", 3), ("d", 4), ("e", 5))
      .toDF("label", "v")
    def order(out: org.apache.spark.sql.DataFrame): Seq[String] =
      out.orderBy("row_pos").collect().map(_.getString(0)).toSeq
    // before: b moves directly before d -> a c b d e
    assert(order(df.moveRows("label", "b", "d")) ===
      Seq("a", "c", "b", "d", "e"))
    // after: b moves directly after d -> a c d b e
    assert(order(df.moveRows("label", "b", "d", position = "after")) ===
      Seq("a", "c", "d", "b", "e"))
    // moving to the same place is a no-op; positions stay 0..n-1
    val noop = df.moveRows("label", "b", "c")
    assert(order(noop) === Seq("a", "b", "c", "d", "e"))
    assert(noop.orderBy("row_pos").collect().map(_.getLong(2)).toSeq ===
      (0L to 4L))
    // a multi-row source block keeps its internal order
    val dup = Seq(("a", 1), ("b", 2), ("b", 3), ("c", 4)).toDF("label", "v")
    val moved = dup.moveRows("label", "b", "c", position = "after")
    assert(moved.orderBy("row_pos").collect()
      .map(r => (r.getString(0), r.getInt(1))).toSeq ===
      Seq(("a", 1), ("c", 4), ("b", 2), ("b", 3)))
    // missing labels raise (the reference's KeyError)
    intercept[NoSuchElementException](df.moveRows("label", "zz", "d").count())
    intercept[NoSuchElementException](df.moveRows("label", "b", "zz").count())
    intercept[IllegalArgumentException](
      df.moveRows("label", "b", "d", position = "sideways"))
  }
}
