package graft

import graft.operators.ReshapeOps
import graft.syntax._
import org.apache.spark.sql.functions.col

/** The reference's pivot_longer doctest matrix, ported case by case as
  * golden tests (reference: janitor/functions/pivot.py:60-315 — SURVEY
  * §7.3.4 called this the largest semantic surface). Expected row sets are
  * the doctest outputs verbatim; row ORDER is compared as a set because
  * Spark output order is partition-dependent by contract (the reference's
  * sort_by_appearance has no distributed meaning — callers sort
  * explicitly). The two doctests exercising pandas' column-selection DSL
  * (is_string_dtype / slice("x_1_mean", ...)) reduce to the same outputs
  * as their explicit-list twins and are covered via `columnNames`.
  */
class PivotLongerDoctestSpec extends SparkSpec {
  import spark.implicits._

  private lazy val iris = Seq(
    (5.1, 3.5, 1.4, 0.2, "setosa"),
    (5.9, 3.0, 5.1, 1.8, "virginica"))
    .toDF("Sepal.Length", "Sepal.Width", "Petal.Length", "Petal.Width", "Species")

  test("doctest: replicate pandas' melt (default names_to='variable')") {
    val out = iris.pivotLonger(index = Seq("Species"))
    assert(out.columns.toSeq == Seq("Species", "variable", "value"))
    assert(sorted(out) == sorted(Seq(
      ("setosa", "Sepal.Length", 5.1), ("virginica", "Sepal.Length", 5.9),
      ("setosa", "Sepal.Width", 3.5), ("virginica", "Sepal.Width", 3.0),
      ("setosa", "Petal.Length", 1.4), ("virginica", "Petal.Length", 5.1),
      ("setosa", "Petal.Width", 0.2), ("virginica", "Petal.Width", 1.8))
      .toDF("Species", "variable", "value")))
  }

  test("doctest: split column labels with names_sep") {
    val out = iris.pivotLonger(index = Seq("Species"),
      namesTo = Seq("part", "dimension"), namesSep = Some("."))
    assert(out.columns.toSeq == Seq("Species", "part", "dimension", "value"))
    assert(sorted(out) == sorted(Seq(
      ("setosa", "Sepal", "Length", 5.1), ("setosa", "Sepal", "Width", 3.5),
      ("setosa", "Petal", "Length", 1.4), ("setosa", "Petal", "Width", 0.2),
      ("virginica", "Sepal", "Length", 5.9), ("virginica", "Sepal", "Width", 3.0),
      ("virginica", "Petal", "Length", 5.1), ("virginica", "Petal", "Width", 1.8))
      .toDF("Species", "part", "dimension", "value")))
  }

  test("doctest: retain parts of column names as headers (.value)") {
    val out = iris.pivotLonger(index = Seq("Species"),
      namesTo = Seq("part", ".value"), namesSep = Some("."))
    assert(out.columns.toSet == Set("Species", "part", "Length", "Width"))
    assert(sorted(out.select("Species", "part", "Length", "Width")) == sorted(Seq(
      ("setosa", "Sepal", 5.1, 3.5), ("setosa", "Petal", 1.4, 0.2),
      ("virginica", "Sepal", 5.9, 3.0), ("virginica", "Petal", 5.1, 1.8))
      .toDF("Species", "part", "Length", "Width")))
  }

  private lazy val tb = Seq((1, 2, 3)).toDF("id", "new_sp_m5564", "newrel_f65")

  test("doctest: split column labels based on regex") {
    val out = tb.pivotLonger(index = Seq("id"),
      namesTo = Seq("diagnosis", "gender", "age"),
      namesPattern = Some("new_?(.+)_(.)(\\d+)"))
    assert(out.columns.toSeq == Seq("id", "diagnosis", "gender", "age", "value"))
    assert(sorted(out) == sorted(Seq(
      (1, "sp", "m", "5564", 2), (1, "rel", "f", "65", 3))
      .toDF("id", "diagnosis", "gender", "age", "value")))
  }

  test("doctest: named groups in names_pattern (python (?P<...>) spelling)") {
    val out = ReshapeOps.pivotLongerNamedGroups(tb, index = Seq("id"),
      namesPattern = "new_?(?P<diagnosis>.+)_(?P<gender>.)(?P<age>\\d+)")
    assert(out.columns.toSeq == Seq("id", "diagnosis", "gender", "age", "value"))
    assert(sorted(out) == sorted(Seq(
      (1, "sp", "m", "5564", 2), (1, "rel", "f", "65", 3))
      .toDF("id", "diagnosis", "gender", "age", "value")))
  }

  test("doctest: names_transform converts label dtypes") {
    val out = tb.pivotLonger(index = Seq("id"),
      namesTo = Seq("diagnosis", "gender", "age"),
      namesPattern = Some("new_?(.+)_(.)(\\d+)"),
      namesTransform = Map("age" -> "int"))
    assert(out.schema("age").dataType ==
      org.apache.spark.sql.types.IntegerType)
    assert(sorted(out.select("id", "age", "value")) == sorted(Seq(
      (1, 5564, 2), (1, 65, 3)).toDF("id", "age", "value")))
  }

  private lazy val xy = Seq((10, 20, 30, 40, 50))
    .toDF("x_1_mean", "x_2_mean", "y_1_mean", "y_2_mean", "unit")

  test("doctest: multiple .value reshapes") {
    val out = xy.pivotLonger(index = Seq("unit"),
      namesTo = Seq(".value", "time", ".value"),
      namesPattern = Some("(x|y)_([0-9])(_mean)"))
    assert(out.columns.toSet == Set("unit", "time", "x_mean", "y_mean"))
    assert(sorted(out.select("unit", "time", "x_mean", "y_mean")) == sorted(Seq(
      (50, "1", 10, 30), (50, "2", 20, 40))
      .toDF("unit", "time", "x_mean", "y_mean")))
  }

  test("doctest: multiple .value via underscore named groups") {
    val out = ReshapeOps.pivotLongerNamedGroups(xy, index = Seq("unit"),
      namesPattern = "(?P<_>x|y)_(?P<time>[0-9])(?P<__>_mean)")
    assert(sorted(out.select("unit", "time", "x_mean", "y_mean")) == sorted(Seq(
      (50, "1", 10, 30), (50, "2", 20, 40))
      .toDF("unit", "time", "x_mean", "y_mean")))
  }

  test("doctest: column_names selection (explicit list stands in for the DSL)") {
    val out = xy.pivotLonger(index = Seq("unit"),
      namesTo = Seq(".value", "time", ".value"),
      namesPattern = Some("(x|y)_([0-9])(_mean)"),
      columnNames = Seq("x_1_mean", "x_2_mean", "y_1_mean", "y_2_mean"))
    assert(sorted(out.select("unit", "time", "x_mean", "y_mean")) == sorted(Seq(
      (50, "1", 10, 30), (50, "2", 20, 40))
      .toDF("unit", "time", "x_mean", "y_mean")))
  }

  private lazy val hr = Seq(
    (514, 545, "Red Sox", 2007, 2008),
    (573, 526, "Yankees", 2007, 2008))
    .toDF("hr1", "hr2", "team", "year1", "year2")

  private val hrExpected = Seq(
    ("Red Sox", 514, 2007), ("Yankees", 573, 2007),
    ("Red Sox", 545, 2008), ("Yankees", 526, 2008))

  test("doctest: sequence names_pattern pairs up column families") {
    val out = hr.pivotLongerMulti(index = Seq("team"),
      namesTo = Seq("year", "hr"), namesPatterns = Seq("year", "hr"))
    assert(out.columns.toSet == Set("team", "year", "hr"))
    assert(sorted(out.select("team", "hr", "year")) ==
      sorted(hrExpected.toDF("team", "hr", "year")))
  }

  test("doctest: dictionary names_pattern") {
    val out = ReshapeOps.pivotLongerDict(hr, index = Seq("team"),
      pattern = Seq("year" -> "year", "hr" -> "hr"))
    assert(sorted(out.select("team", "hr", "year")) ==
      sorted(hrExpected.toDF("team", "hr", "year")))
  }

  private lazy val fruit = Seq(
    ("Houston", "Texas", "Aria", 4, 10, 40, 16, 20),
    ("Austin", "Texas", "Penelope", 10, 8, 99, 200, 33),
    ("Hoover", "Alabama", "Niko", 90, 14, 43, 34, 18))
    .toDF("City", "State", "Name", "Mango", "Orange", "Watermelon", "Gin", "Vodka")

  private val fruitExpected = Seq(
    ("Houston", "Texas", "Mango", "Gin", Some(4), Some(16)),
    ("Austin", "Texas", "Mango", "Gin", Some(10), Some(200)),
    ("Hoover", "Alabama", "Mango", "Gin", Some(90), Some(34)),
    ("Houston", "Texas", "Orange", "Vodka", Some(10), Some(20)),
    ("Austin", "Texas", "Orange", "Vodka", Some(8), Some(33)),
    ("Hoover", "Alabama", "Orange", "Vodka", Some(14), Some(18)),
    ("Houston", "Texas", "Watermelon", null, Some(40), None),
    ("Austin", "Texas", "Watermelon", null, Some(99), None),
    ("Hoover", "Alabama", "Watermelon", null, Some(43), None))

  test("doctest: multiple values_to (ragged families null-fill)") {
    val out = ReshapeOps.pivotLongerValuesTo(fruit,
      index = Seq("City", "State"), namesTo = Seq("Fruit", "Drink"),
      valuesTo = Seq("Pounds", "Ounces"), namesPatterns = Seq("M|O|W", "G|V"),
      columnNames = Seq("Mango", "Orange", "Watermelon", "Gin", "Vodka"))
    assert(out.columns.toSet ==
      Set("City", "State", "Fruit", "Drink", "Pounds", "Ounces"))
    assert(sorted(out.select("City", "State", "Fruit", "Drink", "Pounds", "Ounces")) ==
      sorted(fruitExpected
        .toDF("City", "State", "Fruit", "Drink", "Pounds", "Ounces")))
  }

  test("doctest: nested dictionary names_pattern (names_to + values_to from keys)") {
    val out = ReshapeOps.pivotLongerNestedDict(fruit,
      index = Seq("City", "State"),
      pattern = Seq(("Fruit", "Pounds", "M|O|W"), ("Drink", "Ounces", "G|V")))
    assert(sorted(out.select("City", "State", "Fruit", "Drink", "Pounds", "Ounces")) ==
      sorted(fruitExpected
        .toDF("City", "State", "Fruit", "Drink", "Pounds", "Ounces")))
  }

  // ---- polars backend golden cases (janitor/polars/pivot_longer.py and
  // tests/polars/functions/test_pivot_longer{,_spec}_polars.py) — the one
  // reference surface with independent reshape semantics ----

  private lazy val singleVal =
    Seq((1, 4, 5), (2, 5, 6), (3, 6, 7)).toDF("id", "x1", "x2")

  test("polars: names_to='.value' only stacks same-target sources (cum_count path)") {
    // test_names_pattern_single_column: x1 AND x2 both map to ".value"="x";
    // occurrences stack instead of last-wins
    val out = singleVal.pivotLonger(index = Seq("id"),
      namesTo = Seq(".value"), namesPattern = Some("(.)."))
    assert(out.columns.toSeq == Seq("id", "x"))
    assert(sorted(out) == sorted(Seq(
      (1, 4), (2, 5), (3, 6), (1, 5), (2, 6), (3, 7)).toDF("id", "x")))
  }

  test("polars: names_to=('.value','.value') concatenates back to the identity") {
    // test_multiple_dot_value2: pattern "(.)(.)" re-assembles x1/x2 — the
    // reshape is the identity frame
    val out = singleVal.pivotLonger(index = Seq("id"),
      namesTo = Seq(".value", ".value"), namesPattern = Some("(.)(.)"))
    assert(out.columns.toSeq == Seq("id", "x1", "x2"))
    assert(sorted(out) == sorted(singleVal))
  }

  test("polars: nulls in data flow through .value reshapes (test_names_pattern_nulls_in_data)") {
    val dfNull = Seq(
      (1, "1998-11-26", "2000-01-29", Some(1.0), Some(2.0)),
      (2, "1996-06-22", null, Some(2.0), None),
      (3, "2002-07-11", "2004-04-05", Some(2.0), Some(2.0)),
      (4, "2004-10-10", "2009-08-27", Some(1.0), Some(1.0)),
      (5, "2000-12-05", "2005-02-28", Some(2.0), Some(1.0)))
      .toDF("family", "dob_child1", "dob_child2", "gender_child1", "gender_child2")
    val out = dfNull.pivotLonger(index = Seq("family"),
      namesTo = Seq(".value", "child"), namesPattern = Some("(.+)_(.+)"))
      .select("family", "child", "dob", "gender")
    assert(out.count() == 10)
    val r2 = out.filter(col("family") === 2 && col("child") === "child2").collect()(0)
    assert(r2.isNullAt(2) && r2.isNullAt(3)) // nulls preserved, not dropped
  }

  test("polars: pivot_longer_spec golden value case and error contracts") {
    val dfChecks = Seq(
      (1, 1, 2.8, 3.4), (1, 2, 2.9, 3.8), (1, 3, 2.2, 2.9),
      (2, 1, 2.0, 3.2), (2, 2, 1.8, 2.8), (2, 3, 1.9, 2.4),
      (3, 1, 2.2, 3.3), (3, 2, 2.3, 3.4), (3, 3, 2.1, 2.9))
      .toDF("famid", "birth", "ht1", "ht2")
    val spec = Seq(
      ("ht1", "ht", Map("age" -> "1")),
      ("ht2", "ht", Map("age" -> "2")))
    val out = ReshapeOps.pivotLongerSpec(dfChecks, Seq("famid", "birth"), spec)
      .select("famid", "birth", "age", "ht")
    assert(out.count() == 18)
    assert(out.filter(col("famid") === 1 && col("birth") === 1 &&
      col("age") === "1").collect()(0).getDouble(3) == 2.8)
    assert(out.filter(col("famid") === 3 && col("birth") === 3 &&
      col("age") === "2").collect()(0).getDouble(3) == 2.9)
    // test_spec_columns_dot_name_unique
    intercept[IllegalArgumentException](ReshapeOps.pivotLongerSpec(dfChecks,
      Seq("famid", "birth"),
      Seq(("ht2", "ht", Map("age" -> "1")), ("ht2", "ht", Map("age" -> "2")))))
    // test_spec_columns_index: spec label col collides with a frame column
    intercept[IllegalArgumentException](ReshapeOps.pivotLongerSpec(dfChecks,
      Seq("famid"),
      Seq(("ht1", "ht", Map("birth" -> "1")), ("ht2", "ht", Map("birth" -> "2")))))
    // a .name label missing from the frame raises eagerly
    intercept[IllegalArgumentException](ReshapeOps.pivotLongerSpec(dfChecks,
      Seq("famid", "birth"),
      Seq(("ht9", "ht", Map("age" -> "1")))))
  }
}
