package graft

import graft.ColumnSelector._
import graft.syntax._

/** Golden port of tests/functions/test_select_columns.py — the column-axis
  * DSL value cases beyond the DropLabel-merge already in FidelitySweepSpec.
  * Output ORDER is part of the contract: selection order for hits,
  * schema order for inverted complements.
  */
class SelectColumnsSweepSpec extends SparkSpec {
  import spark.implicits._

  // conftest.py `dataframe` fixture labels (values immaterial for selection)
  private def base = Seq((1, 1.23452345, 1, "rabbit", "Cambridge"))
    .toDF("a", "Bell__Chart", "decorated-elephant", "animals@#$%^", "cities")

  // df_strings fixture labels
  private def dfStrings = Seq((0, "ABC", 1, 4.0, "8", "S", "E", "T", "a", "2018-01-01"))
    .toDF("id", "Name", "code", "code1", "code2", "type", "type1", "type2",
      "code3", "type3")

  test("label list and its inverse (test_select_column_names)") {
    assert(base.selectColumns(Exact("a"), Exact("Bell__Chart"), Exact("cities"))
      .columns.toSeq == Seq("a", "Bell__Chart", "cities"))
    assert(base.selectColumnsInvert(Exact("a"), Exact("Bell__Chart"), Exact("cities"))
      .columns.toSeq == Seq("decorated-elephant", "animals@#$%^"))
  }

  test("DropLabel with invert selects the dropped labels (test_..._droplabel)") {
    val dropped = Seq("a", "Bell__Chart", "cities")
    assert(base.selectColumns(Not(Any(dropped.map(Exact(_)))))
      .columns.toSeq == Seq("decorated-elephant", "animals@#$%^"))
    assert(base.selectColumnsInvert(Not(Any(dropped.map(Exact(_)))))
      .columns.toSeq == Seq("a", "Bell__Chart", "cities"))
  }

  test("glob inputs keep selection order; invert keeps schema order") {
    // test_select_column_names_glob_inputs: ["Bell__Chart", "a*"]
    assert(base.selectColumns(Exact("Bell__Chart"), Glob("a*"))
      .columns.toSeq == Seq("Bell__Chart", "a", "animals@#$%^"))
    assert(base.selectColumnsInvert(Exact("Bell__Chart"), Glob("a*"))
      .columns.toSeq == Seq("decorated-elephant", "cities"))
  }

  test("any missing label or unmatched glob raises (test_..._missing_columns)") {
    intercept[NoSuchElementException](
      base.selectColumns(Exact("a"), Exact("Bell__Chart"), Exact("foo")))
    intercept[NoSuchElementException](
      base.selectColumns(Exact("a"), Exact("Bell__Chart"), Exact("foo"), Exact("bar")))
    intercept[NoSuchElementException](
      base.selectColumns(Glob("a*"), Exact("Bell__Chart"), Exact("foo")))
    // a glob that matches nothing raises too (test_col_not_found family)
    intercept[NoSuchElementException](base.selectColumns(Glob("sam*")))
    intercept[NoSuchElementException](base.selectColumns(Rx("word".r)))
  }

  test("callable/predicate selection in schema order (test_select_callable_columns)") {
    val hasSep = Pred(f => f.name.contains("-") || f.name.contains("__"))
    assert(base.selectColumns(hasSep).columns.toSeq ==
      Seq("Bell__Chart", "decorated-elephant"))
    assert(base.selectColumnsInvert(hasSep).columns.toSeq ==
      Seq("a", "animals@#$%^", "cities"))
  }

  test("regex selection uses search semantics (test_regex)") {
    assert(dfStrings.selectColumns(Rx("\\d$".r)).columns.toSeq ==
      Seq("code1", "code2", "type1", "type2", "code3", "type3"))
  }

  test("label slices: closed, open, full, stepped, reverse (test_slice)") {
    assert(dfStrings.selectColumns(Slice("code", "code2")).columns.toSeq ==
      Seq("code", "code1", "code2"))
    assert(dfStrings.selectColumns(Slice(Some("code2"), None)).columns.toSeq ==
      Seq("code2", "type", "type1", "type2", "code3", "type3"))
    assert(dfStrings.selectColumns(Slice(None, Some("code2"))).columns.toSeq ==
      Seq("id", "Name", "code", "code1", "code2"))
    assert(dfStrings.selectColumns(Slice(None, None)).columns.toSeq ==
      dfStrings.columns.toSeq)
    assert(dfStrings.selectColumns(Slice(None, None, 2)).columns.toSeq ==
      Seq("id", "code", "code2", "type1", "code3"))
    // test_slice_reverse: slice("code2", "code", -1)
    assert(dfStrings.selectColumns(Slice(Some("code2"), Some("code"), -1))
      .columns.toSeq == Seq("code2", "code1", "code"))
    // a later-to-earlier slice with positive step selects nothing, like .loc
    assert(ColumnSelector.resolve(dfStrings.schema,
      Seq(Slice("code2", "code"))).isEmpty)
  }

  test("slicing duplicate labels raises (test_slice_unique)") {
    val notUnique = Seq((1, 2, 3, 4)).toDF("code", "code2", "code1", "code")
    val e = intercept[IllegalArgumentException](
      notUnique.selectColumns(Slice("code", "code2")))
    assert(e.getMessage.contains("monotonic increasing"))
  }

  test("move: sequence sources/targets use the searchsorted insertion rule") {
    // tests/functions/test_move.py abcdefghij fixture
    val d = Seq((1,2,3,4,5,6,7,8,9,10))
      .toDF("a","b","c","d","e","f","g","h","i","j")
    // test_move_source_target_seq
    assert(d.moveColumns(Seq(Exact("j"), Exact("a")),
        Seq(Exact("c"), Exact("e"))).columns.toSeq ==
      Seq("b","j","a","c","d","e","f","g","h","i"))
    // test_move_source_target_seq_after
    assert(d.moveColumns(Seq(Exact("j"), Exact("a")),
        Seq(Exact("c"), Exact("e")), position = "after").columns.toSeq ==
      Seq("b","c","d","e","j","a","f","g","h","i"))
    // test_move_reorder_columns: no target, before -> front; full-source
    // after -> unchanged
    assert(base.moveColumns(Seq(Exact("animals@#$%^"), Exact("Bell__Chart")))
      .columns.toSeq ==
      Seq("animals@#$%^", "Bell__Chart", "a", "decorated-elephant", "cities"))
    assert(d.moveColumns(d.columns.toSeq.map(Exact(_)), position = "after")
      .columns.toSeq == d.columns.toSeq)
    // test_move_col / test_move_col_after single-label forms
    assert(d.moveColumn("b", "d").columns.toSeq ==
      Seq("a","c","b","d","e","f","g","h","i","j"))
    assert(d.moveColumn("b", "d", position = "after").columns.toSeq ==
      Seq("a","c","d","b","e","f","g","h","i","j"))
    // test_move_invalid_args
    intercept[IllegalArgumentException](
      d.moveColumn("a", "c", position = "oops"))
    intercept[NoSuchElementException](d.moveColumn("__oops__", "c"))
    intercept[NoSuchElementException](d.moveColumn("a", "__oops__"))
    // test_move_unique: duplicate labels refuse to move
    val dup = Seq((1, 2, 3)).toDF("a", "b", "b")
    intercept[IllegalArgumentException](
      dup.moveColumns(Seq(Exact("a"))))
  }

  test("combined select inverts both axes at once (test_select.py test_invert)") {
    val d = Seq(("bar", 1, 10), ("baz", 2, 20), ("foo", 3, 30))
      .toDF("k", "col1", "col2")
    val out = d.selectBoth("k", rows = Some(RowSelector.Label("bar")),
      columns = Seq(Exact("col1")), invert = true)
    assert(out.columns.toSeq == Seq("k", "col2"))
    assert(out.orderBy("k").collect().map(_.getString(0)).toSeq == Seq("baz", "foo"))
    // rows-only and columns-only forms
    assert(d.selectBoth("k", rows = Some(RowSelector.Label("baz"))).count() == 1)
    assert(d.selectBoth("k", columns = Seq(Glob("col*"))).columns.toSeq ==
      Seq("col1", "col2"))
  }

  test("boolean mask selection and its length contract (test_list_boolean)") {
    val mask = Seq(true, false, true, false, true, false, true, false, true, false)
    assert(dfStrings.selectColumns(Mask(mask)).columns.toSeq ==
      Seq("id", "code", "code2", "type1", "code3"))
    val e = intercept[IllegalArgumentException](
      dfStrings.selectColumns(Mask(Seq(true, false))))
    assert(e.getMessage.contains("length of the list of booleans"))
  }
}
