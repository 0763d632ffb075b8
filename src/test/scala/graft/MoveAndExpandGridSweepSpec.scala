package graft

import graft.operators.{ReshapeOps, SelectOps}
import graft.ColumnSelector.Exact
import org.apache.spark.sql.functions._

/** Round-18 fidelity sweep over tests/functions/test_move.py (220 LoC) and
  * tests/functions/test_expand_grid.py (347 LoC) — the two largest
  * reference test files that previously had only driver gates over the
  * r17-new moveRows / keyless cartesian machinery. Golden value ports of
  * every literal expected ordering plus the error contracts; the
  * hypothesis-generated cases reduce to the same kernels.
  */
class MoveAndExpandGridSweepSpec extends SparkSpec {
  import spark.implicits._

  // test_move.py module-level df: 10 columns a..j (values irrelevant to
  // the ordering contracts — a single row suffices)
  private def tenCols = Seq((1, 2, 3, 4, 5, 6, 7, 8, 9, 10))
    .toDF("a", "b", "c", "d", "e", "f", "g", "h", "i", "j")

  // the conftest `dataframe` fixture's column set
  private def fixtureCols = Seq((1.0, 1, "rabbit", "Cambridge", 26))
    .toDF("a", "Bell__Chart", "animals@#$%^", "cities", "decorated-elephant")
    .select("a", "Bell__Chart", "decorated-elephant", "animals@#$%^", "cities")

  test("move col before/after (test_move_col, test_move_col_after)") {
    // source = columns[1], target = columns[3]: before puts source at
    // target_index-1, after at target_index
    val cols = fixtureCols.columns
    val before = SelectOps.moveColumns(fixtureCols,
      Seq(Exact(cols(1))), Seq(Exact(cols(3))), "before").columns.toSeq
    assert(before(3 - 1) == cols(1))
    assert(before == Seq("a", "decorated-elephant", "Bell__Chart",
      "animals@#$%^", "cities"))
    val after = SelectOps.moveColumns(fixtureCols,
      Seq(Exact(cols(1))), Seq(Exact(cols(3))), "after").columns.toSeq
    assert(after(3) == cols(1))
    assert(after == Seq("a", "decorated-elephant", "animals@#$%^",
      "Bell__Chart", "cities"))
  }

  test("move source+target sequences golden (test_move_source_target_seq[_after])") {
    // np.random df columns a..j; source ["j","a"], target ["c","e"]
    val before = SelectOps.moveColumns(tenCols,
      Seq(Exact("j"), Exact("a")), Seq(Exact("c"), Exact("e")), "before")
    assert(before.columns.toSeq ==
      Seq("b", "j", "a", "c", "d", "e", "f", "g", "h", "i"))
    val after = SelectOps.moveColumns(tenCols,
      Seq(Exact("j"), Exact("a")), Seq(Exact("c"), Exact("e")), "after")
    assert(after.columns.toSeq ==
      Seq("b", "c", "d", "e", "j", "a", "f", "g", "h", "i"))
  }

  test("move with no target replicates reorder_columns (test_move_reorder_columns)") {
    // source = every column, position=after, no target -> order unchanged
    val all = SelectOps.moveColumns(fixtureCols,
      fixtureCols.columns.toSeq.map(Exact(_)), Nil, "after")
    assert(all.columns.toSeq == fixtureCols.columns.toSeq)
    // a source block with no target lands at the FRONT under before
    val front = SelectOps.moveColumns(fixtureCols,
      Seq(Exact("animals@#$%^"), Exact("Bell__Chart")), Nil, "before")
    assert(front.columns.toSeq ==
      Seq("animals@#$%^", "Bell__Chart", "a", "decorated-elephant", "cities"))
  }

  test("move error contracts (test_move_invalid_args, test_move_unique)") {
    intercept[IllegalArgumentException](SelectOps.moveColumns(fixtureCols,
      Seq(Exact("a")), Seq(Exact("cities")), "oops"))
    intercept[NoSuchElementException](SelectOps.moveColumns(fixtureCols,
      Seq(Exact("__oops__")), Seq(Exact("cities")), "before"))
    intercept[NoSuchElementException](SelectOps.moveColumns(fixtureCols,
      Seq(Exact("a")), Seq(Exact("__oops__")), "before"))
    // duplicate labels raise (move.py `assert names.is_unique`)
    val dup = Seq((1, 2, 3)).toDF("a", "b", "c").toDF("a", "b", "b")
    intercept[IllegalArgumentException](SelectOps.moveColumns(dup,
      Seq(Exact("a")), Nil, "before"))
  }

  private def rowsDf = Seq((0, "w0"), (1, "w1"), (2, "w2"), (3, "w3"), (4, "w4"))
    .toDF("idx", "v")

  test("move row before/after integer labels (test_move_row, test_move_row_after)") {
    // source label 1, target label 3: before -> [0,2,1,3,4] (source ends up
    // at position target-1), after -> [0,2,3,1,4] (position target)
    def order(position: String): Seq[Int] =
      SelectOps.moveRows(rowsDf, "idx", 1, 3, position)
        .orderBy("row_pos").collect().map(_.getInt(0)).toSeq
    assert(order("before") == Seq(0, 2, 1, 3, 4))
    assert(order("after") == Seq(0, 2, 3, 1, 4))
  }

  test("move row string labels (test_move_row[_after]_strings)") {
    // the fixture dedupes animal names and moves rows[1] relative to
    // rows[2]; with string labels the contract is identical to the integer
    // case — source lands immediately before/after the target row. The
    // presentation order a distributed frame starts from is the indexCol's
    // SORT order (leopard, lion, rabbit), the stand-in for pandas row
    // positions.
    val d = Seq(("rabbit", 1), ("leopard", 2), ("lion", 3))
      .toDF("animal", "n")
    def order(position: String): Seq[String] =
      SelectOps.moveRows(d, "animal", "rabbit", "lion", position)
        .orderBy("row_pos").collect().map(_.getString(0)).toSeq
    // rabbit (last) moved before lion -> between leopard and lion...
    assert(order("before") == Seq("leopard", "rabbit", "lion"))
    // ...and immediately after lion under after
    assert(order("after") == Seq("leopard", "lion", "rabbit"))
    intercept[NoSuchElementException](
      SelectOps.moveRows(d, "animal", "zebra", "lion").collect())
    intercept[NoSuchElementException](
      SelectOps.moveRows(d, "animal", "lion", "zebra").collect())
  }

  // ---- test_expand_grid.py ----

  private def collectPairs(df: org.apache.spark.sql.DataFrame): Seq[(Any, Any)] =
    df.collect().map(r => (r.get(0), r.get(1))).toSeq.sortBy(_.toString)

  test("expand_grid Series x Series cross with duplicates kept (test_series)") {
    // reference: others={"A": a, "B": cities} -> MultiIndex (A,a),(B,cities);
    // our flat normal form is {key}_{col}. Duplicate VALUES are preserved —
    // expand_grid crosses rows, it never dedupes (unlike expand)
    val a = Seq(1, 2, 2).toDF("a")
    val cities = Seq("Basel", "Basel").toDF("cities")
    val out = ReshapeOps.expandGridFrames(Seq("A" -> a, "B" -> cities))
    assert(out.columns.toSeq == Seq("A_a", "B_cities"))
    assert(out.count() == 6)
    val expected = for { x <- Seq(1, 2, 2); y <- Seq("Basel", "Basel") }
      yield (x: Any, y: Any)
    assert(collectPairs(out) == expected.sortBy(_.toString))
  }

  test("expand_grid Series x DataFrame (test_series_dataframe)") {
    // a 2-column frame entry contributes BOTH columns under its key
    val a = Seq(10, 20).toDF("a")
    val b = Seq((1.5, "x"), (2.5, "y"), (3.5, "z")).toDF("m", "n")
    val out = ReshapeOps.expandGridFrames(Seq("A" -> a, "B" -> b))
    assert(out.columns.toSeq == Seq("A_a", "B_m", "B_n"))
    assert(out.count() == 6)
    assert(out.select(countDistinct(col("A_a"), col("B_m"), col("B_n")))
      .collect()(0).getLong(0) == 6)
  }

  test("expand_grid scalar entry (test_scalar)") {
    // B=2 becomes a single-row entry: output has len(A) rows, B constant
    val out = ReshapeOps.expandGrid(spark,
      Seq("A" -> Seq(1, 2, 3), "B" -> Seq(2)))
    assert(out.columns.toSeq == Seq("A", "B"))
    assert(out.count() == 3)
    assert(out.select("B").distinct().collect().map(_.getInt(0)).toSeq == Seq(2))
  }

  test("expand_grid categorical-values entry keeps duplicates (test_extension_array)") {
    // id=(2,1,1,2,1), year=(2018,2018,2019,2020,2020), gender 5 values:
    // the cross is 5*5*5 rows and the duplicate ids survive with their
    // multiplicity (the reference's cross-merge of the raw Series)
    val out = ReshapeOps.expandGrid(spark, Seq(
      "id" -> Seq(2, 1, 1, 2, 1),
      "year" -> Seq(2018, 2018, 2019, 2020, 2020),
      "gender" -> Seq("female", "male", "male", "female", "male")))
    assert(out.count() == 125)
    // id=1 appears 3/5 of the time
    assert(out.filter(col("id") === 1).count() == 75)
    // (year=2018, gender=male) multiplicity = 2 year rows * 3 male rows
    // per id row
    assert(out.filter(col("year") === 2018 && col("gender") === "male")
      .count() == 5 * 2 * 3)
  }

  test("expand_grid chain form keys the frame side too (test_chain_df)") {
    val cities = Seq("Basel", "Olten").toDF("cities")
    val a = Seq(7, 8).toDF("a")
    val out = ReshapeOps.expandGridFrames(Seq("city" -> cities, "A" -> a))
    assert(out.columns.toSeq == Seq("city_cities", "A_a"))
    assert(out.count() == 4)
  }

  test("expand_grid error contracts (duplicate keys, empty entries)") {
    val d = Seq(1).toDF("x")
    intercept[IllegalArgumentException](
      ReshapeOps.expandGridFrames(Seq("A" -> d, "A" -> d)))
    intercept[IllegalArgumentException](
      ReshapeOps.expandGrid(spark, Seq("A" -> Seq.empty[Any])))
  }
}
