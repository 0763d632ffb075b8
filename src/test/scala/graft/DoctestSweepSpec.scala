package graft

import graft.syntax._
import org.apache.spark.sql.functions._

/** Golden ports of reference docstring examples not yet asserted elsewhere
  * (reference: janitor/functions/{get_dupes,groupby_agg,case_when,
  * concatenate_columns,drop_constant_columns,coalesce}.py doctests). Each
  * block is a concrete input table → output table from the reference docs —
  * the same fidelity layer as PivotLongerDoctestSpec/FlagJumpsDoctestSpec.
  */
class DoctestSweepSpec extends SparkSpec {
  import spark.implicits._

  test("get_dupes doctest: all-columns and per-column subsets") {
    val df = Seq(("shoe", 100), ("shoe", 100), ("bag", 75), ("shoe", 200), ("bag", 75))
      .toDF("item", "quantity")
    // default = all columns: the (shoe,100) pair and the (bag,75) pair
    val all = df.getDupes().collect().map(r => (r.getString(0), r.getInt(1)))
    assert(all.sorted.toSeq == Seq(("bag", 75), ("bag", 75), ("shoe", 100), ("shoe", 100)))
    // subset=item: every row is a dup (both items repeat)
    assert(df.getDupes("item").count() == 5)
    // subset=quantity: 100 and 75 repeat; 200 is unique
    val q = df.getDupes("quantity").collect().map(_.getInt(1)).sorted.toSeq
    assert(q == Seq(75, 75, 100, 100))
  }

  test("groupby_agg doctests: mean broadcast-back and dropna=False count") {
    val df = Seq(("shoe", 100), ("shoe", 120), ("bag", 75), ("shoe", 200), ("bag", 25))
      .toDF("item", "quantity")
    val avg = df.groupbyAgg(Seq("item"), "quantity", "mean", "avg_quantity")
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(avg("shoe") == 140.0 && avg("bag") == 50.0)
    // dropna=False: None is a key of its own (count 1); dropna=True nulls it
    val df2 = Seq(Some("a"), Some("a"), None, Some("b")).zip(Seq(9, 9, 9, 9))
      .toDF("x", "y")
    val keep = df2.groupbyAgg(Seq("x"), "y", "count", "y_count", dropna = false)
      .collect().map(r => Option(r.getString(0)) -> r.getLong(2)).toMap
    assert(keep(Some("a")) == 2L && keep(None) == 1L && keep(Some("b")) == 1L)
    val drop = df2.groupbyAgg(Seq("x"), "y", "count", "y_count", dropna = true)
      .collect().map(r => Option(r.getString(0)) ->
        (if (r.isNullAt(2)) null else r.getLong(2))).toMap
    assert(drop(None) == null)
  }

  test("case_when doctest: ordered conditions, literal and column outcomes") {
    // the reference example over string-typed columns (Spark columns are
    // monotyped; the mixed-object pandas frame maps to strings)
    val df = Seq(("0", "0", "6"), ("0", "3", "7"), ("1", "4", "8"),
      ("2", "5", "9"), ("hi", "bye", "wait")).toDF("a", "b", "c")
    val out = operators.TransformOps.caseWhen(df, "value", Seq(
      (((col("a") === "0") && (col("b") =!= "0")) || (col("c") === "wait"), col("a")),
      ((col("b") === "0") && (col("a") === "0"), lit("x"))),
      default = col("c"))
    assert(out.collect().map(_.getString(3)).toSeq == Seq("x", "0", "8", "9", "hi"))
  }

  test("concatenate_columns doctest: default '-' separator") {
    val df = Seq((1, "x"), (3, "y"), (5, "z")).toDF("a", "b")
    val out = df.concatenateColumns(Seq("a", "b"), "m")
      .collect().map(_.getString(2)).toSeq
    assert(out == Seq("1-x", "3-y", "5-z"))
  }

  test("drop_constant_columns doctest: mixed constant and varying columns") {
    val df = Seq((1, 1, 1, "rabbit", "Cambridge"), (1, 2, 1, "leopard", "Shanghai"),
      (1, 3, 1, "lion", "Basel")).toDF("a", "b", "c", "d", "e")
    assert(df.dropConstantColumns().columns.toSeq == Seq("b", "d", "e"))
  }

  test("coalesce doctests: in-place first column and explicit target with default") {
    val df = Seq[(Option[Double], Option[Double], Option[Double])](
      (None, Some(2.0), Some(4.0)), (Some(1.0), Some(3.0), None), (None, None, None))
      .toDF("a", "b", "c")
    // no target: outcome lands in a, b and c survive
    val inPlace = df.coalesceColumns(Seq("a", "b", "c"))
    assert(inPlace.columns.toSeq == Seq("a", "b", "c"))
    val a = inPlace.collect().map(r => if (r.isNullAt(0)) null else r.getDouble(0)).toSeq
    assert(a == Seq(2.0, 1.0, null))
    // explicit target + default_value
    val df2 = Seq[(Option[Double], Option[Double])](
      (Some(1.0), Some(2.0)), (None, Some(3.0)), (None, None)).toDF("a", "b")
    val out = df2.coalesceColumns(Seq("a", "b"), Some("new_col"), Some(-1.0))
      .collect().map(_.getDouble(2)).toSeq
    assert(out == Seq(1.0, 3.0, -1.0))
  }
}
