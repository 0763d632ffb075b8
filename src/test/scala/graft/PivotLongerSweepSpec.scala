package graft

import graft.operators.ReshapeOps
import graft.syntax._
import org.apache.spark.sql.DataFrame

/** Golden port of the main pandas backend pivot_longer test file
  * (tests/functions/test_pivot_longer.py) — the value cases and error
  * contracts not already covered by PivotLongerDoctestSpec. The sweep found
  * five real divergences, all fixed in ReshapeOps: column_names without an
  * index must keep the untouched columns as the index (:607-613), a
  * multi-character names_sep is a regex like pandas str.split, an all-index
  * call returns the frame unchanged (:624), duplicate (labels, .value) spec
  * rows must raise when other names_to labels are present (:1346), and
  * both-names_sep-and-names_pattern must raise (:679).
  */
class PivotLongerSweepSpec extends SparkSpec {
  import spark.implicits._

  private def dfChecks = Seq(
    (1, 1, 2.8, 3.4), (1, 2, 2.9, 3.8), (1, 3, 2.2, 2.9),
    (2, 1, 2.0, 3.2), (2, 2, 1.8, 2.8), (2, 3, 1.9, 2.4),
    (3, 1, 2.2, 3.3), (3, 2, 2.3, 3.4), (3, 3, 2.1, 2.9))
    .toDF("famid", "birth", "ht1", "ht2")

  private val testDfRows = Seq(
    ("A", "G", 100.07548220000001, 121.271083, 4.472089953, -7.188632000000001),
    ("B", "H", 75.191326, 75.93845266, -144.387785, -143.2288569),
    ("C", "I", 122.65134479999999, 135.043791, -40.45611048, 21.242563),
    ("D", "J", 124.13553329999999, 134.51128400000002, -46.07156181, 40.937416999999996),
    ("E", "K", 124.13553329999999, 134.484374, -46.07156181, 40.78472),
    ("F", "L", 124.01028909999998, 137.962195, -46.01594293, 22.905889000000002))
  private def testDf = testDfRows
    .toDF("off_loc", "pt_loc", "pt_lat", "off_lat", "pt_long", "off_long")

  private val vaultRows = Seq(
    ("United States", 48.1, 45.4, 46.9, 46.0),
    ("Russia", 46.4, 41.6, 45.7, 42.0),
    ("China", 44.3, 40.8, 44.3, 42.1))
  private def notDotValue = vaultRows
    .toDF("country", "vault_2012", "floor_2012", "vault_2016", "floor_2016")

  private def singleVal = Seq((1, 4, 5), (2, 5, 6), (3, 6, 7)).toDF("id", "x1", "x2")

  private def collectSorted(df: DataFrame): Seq[Seq[Any]] = {
    val cols = df.columns.toSeq
    df.collect().map(r => cols.indices.map(r.get)).toSeq
      .sortBy(_.mkString("|"))
  }

  test("pivot with column_names only keeps the untouched columns as index") {
    // test_pivot_column_only: melt(["famid","birth"]) equivalence
    val out = dfChecks.pivotLonger(index = Nil, namesTo = Seq("dim"),
      valuesTo = "num", columnNames = Seq("ht1", "ht2"))
    assert(out.columns.toSeq == Seq("famid", "birth", "dim", "num"))
    val expected = dfChecks.collect().flatMap { r =>
      Seq(Seq[Any](r.getInt(0), r.getInt(1), "ht1", r.getDouble(2)),
        Seq[Any](r.getInt(0), r.getInt(1), "ht2", r.getDouble(3)))
    }.toSeq.sortBy(_.mkString("|"))
    assert(collectSorted(out) == expected)
  }

  test("pivot with index only is a plain melt (test_pivot_index_only)") {
    val out = dfChecks.pivotLonger(index = Seq("famid", "birth"),
      namesTo = Seq("dim"), valuesTo = "num")
    assert(out.columns.toSeq == Seq("famid", "birth", "dim", "num"))
    assert(out.count() == 18)
    assert(out.where($"dim" === "ht1").count() == 9)
  }

  test("all columns in index returns the frame unchanged (test_no_column_names)") {
    val out = dfChecks.pivotLonger(index = Seq("famid", "birth", "ht1", "ht2"))
    assert(collectSorted(out) == collectSorted(dfChecks))
  }

  test(".value + names_pattern on ht columns (test_names_pat_str)") {
    val out = dfChecks.pivotLonger(index = Nil, namesTo = Seq(".value", "age"),
      namesPattern = Some("(.+)(.)"), columnNames = Seq("ht1", "ht2"),
      namesTransform = Map("age" -> "int"))
    assert(out.columns.sorted.toSeq == Seq("age", "birth", "famid", "ht"))
    val expected = dfChecks.collect().flatMap { r =>
      Seq(Seq[Any](r.getInt(0), r.getInt(1), 1, r.getDouble(2)),
        Seq[Any](r.getInt(0), r.getInt(1), 2, r.getDouble(3)))
    }.toSeq.sortBy(_.mkString("|"))
    assert(collectSorted(out.select("famid", "birth", "age", "ht")) == expected)
  }

  test("set/.value over the lat-long frame via names_pattern and names_sep") {
    // test_names_pattern_str + test_names_sep: identical expected output
    val expected = testDfRows.flatMap { case (offLoc, ptLoc, ptLat, offLat, ptLong, offLong) =>
      Seq(Seq[Any]("off", offLoc, offLat, offLong),
        Seq[Any]("pt", ptLoc, ptLat, ptLong))
    }.sortBy(_.mkString("|"))
    for (out <- Seq(
        testDf.pivotLonger(index = Nil, namesTo = Seq("set", ".value"),
          namesPattern = Some("(.+)_(.+)")),
        testDf.pivotLonger(index = Nil, namesTo = Seq("set", ".value"),
          namesSep = Some("_")))) {
      assert(out.columns.sorted.toSeq == Seq("lat", "loc", "long", "set"))
      assert(collectSorted(out.select("set", "loc", "lat", "long")) == expected)
    }
  }

  test("no .value: names_sep/names_pattern/named-groups split labels into event/year") {
    // test_not_dot_value_sep / _pattern / _pattern_named_groups
    val expected = vaultRows.flatMap { case (c, v12, f12, v16, f16) =>
      Seq(Seq[Any](c, "vault", "2012", v12), Seq[Any](c, "floor", "2012", f12),
        Seq[Any](c, "vault", "2016", v16), Seq[Any](c, "floor", "2016", f16))
    }.sortBy(_.mkString("|"))
    val bySep = notDotValue.pivotLonger(index = Seq("country"),
      namesTo = Seq("event", "year"), namesSep = Some("_"), valuesTo = "score")
    val byPattern = notDotValue.pivotLonger(index = Seq("country"),
      namesTo = Seq("event", "year"), namesPattern = Some("(.+)_(.+)"),
      valuesTo = "score")
    val byNamed = notDotValue.pivotLongerNamedGroups(index = Seq("country"),
      namesPattern = "(?P<event>.+)_(?P<year>.+)", valuesTo = "score")
    for (out <- Seq(bySep, byPattern, byNamed)) {
      assert(out.columns.toSeq == Seq("country", "event", "year", "score"))
      assert(collectSorted(out) == expected)
    }
  }

  test("no .value: a separator that never matches degrades to a melt") {
    // test_not_dot_value_sep2 — names_sep="/" leaves one fragment per label
    val out = notDotValue.pivotLonger(index = Seq("country"),
      namesTo = Seq("event"), namesSep = Some("/"), valuesTo = "score")
    assert(out.count() == 12)
    assert(out.where($"event" === "vault_2012").count() == 3)
  }

  test("single value column still splits (test_not_dot_value_sep_single_column)") {
    val out = notDotValue.select("country", "vault_2012")
      .pivotLonger(index = Seq("country"), namesTo = Seq("event", "year"),
        namesSep = Some("_"), valuesTo = "score")
    assert(collectSorted(out) == vaultRows.map { case (c, v12, _, _, _) =>
      Seq[Any](c, "vault", "2012", v12)
    }.sortBy(_.mkString("|")))
  }

  test("sequence names_pattern of length one stacks the claimed columns") {
    // test_names_pattern_sequence_single_unique_column
    val out = singleVal.pivotLongerMulti(index = Seq("id"),
      namesTo = Seq("x"), namesPatterns = Seq("x"))
    assert(collectSorted(out) == Seq(
      Seq[Any](1, 4), Seq[Any](1, 5), Seq[Any](2, 5), Seq[Any](2, 6),
      Seq[Any](3, 6), Seq[Any](3, 7)).sortBy(_.mkString("|")))
  }

  test("string pattern stacks labels; sequence pattern stacks values") {
    // test_names_pattern_single_column_not_dot_value1: label goes to yA
    val d = singleVal.select("id", "x1")
    val labels = d.pivotLonger(index = Seq("id"), namesTo = Seq("yA"),
      namesPattern = Some("(.+)"))
    assert(collectSorted(labels) == Seq(
      Seq[Any](1, "x1", 4), Seq[Any](2, "x1", 5), Seq[Any](3, "x1", 6))
      .sortBy(_.mkString("|")))
    // test_names_pattern_seq_single_column: the VALUES go to yA (a rename)
    val values = d.pivotLongerMulti(index = Seq("id"), namesTo = Seq("yA"),
      namesPatterns = Seq(".+"))
    assert(collectSorted(values) == Seq(
      Seq[Any](1, 4), Seq[Any](2, 5), Seq[Any](3, 6)).sortBy(_.mkString("|")))
  }

  test("dropna drops rows where every stacked value is null") {
    // test_dropna_multiple_columns on the dob/gender fixture
    val dfNull = Seq(
      (1, "1998-11-26", "2000-01-29", 1, Some(2.0)),
      (2, "1996-06-22", null, 2, None),
      (3, "2002-07-11", "2004-04-05", 2, Some(2.0)),
      (4, "2004-10-10", "2009-08-27", 1, Some(1.0)),
      (5, "2000-12-05", "2005-02-28", 2, Some(1.0)))
      .toDF("family", "dob_child1", "dob_child2", "gender_child1", "gender_child2")
    val out = dfNull.pivotLonger(index = Seq("family"),
      namesTo = Seq(".value", "child"), namesPattern = Some("(.+)_(.+)"),
      dropna = true)
    assert(out.count() == 9)
    assert(out.where($"family" === 2 && $"child" === "child2").count() == 0)
    assert(out.where($"family" === 2 && $"child" === "child1").count() == 1)

    // test_dropna_single_column — one value column, melt().dropna()
    val d2 = Seq(
      (Some(1.0), None, None, None), (None, Some(2.0), None, None),
      (None, None, Some(3.0), Some(2.0)), (None, None, Some(1.0), None))
      .toDF("a", "b", "c", "d")
    val out2 = d2.pivotLonger(index = Nil, dropna = true)
    assert(collectSorted(out2) == Seq(
      Seq[Any]("a", 1.0), Seq[Any]("b", 2.0), Seq[Any]("c", 3.0),
      Seq[Any]("c", 1.0), Seq[Any]("d", 2.0)).sortBy(_.mkString("|")))
  }

  test("sequence names_pattern with dropna matches pandas lreshape") {
    // test_dropna_sort_by_appearance (GH #1168): positional pairing of the
    // date/treatment claims, all-null pairs dropped
    val treatments = Seq(
      (1, Some("A"), Some(1), None: Option[String], None: Option[Int], None: Option[String], None: Option[Int]),
      (2, None, None, Some("B"), Some(3), None, None),
      (3, Some("A"), Some(2), Some("B"), Some(2), None, None),
      (4, None, None, None, None, Some("C"), Some(1)),
      (5, None, None, None, None, Some("D"), Some(5)))
      .toDF("id", "A", "A_date", "B", "B_date", "other", "other_date")
    val out = treatments.pivotLongerMulti(index = Seq("id"),
      namesTo = Seq("date", "treatment"), namesPatterns = Seq(".+date$", ".+"),
      dropna = true)
    assert(collectSorted(out.select("id", "treatment", "date")) == Seq(
      Seq[Any](1, "A", 1), Seq[Any](2, "B", 3), Seq[Any](3, "A", 2),
      Seq[Any](3, "B", 2), Seq[Any](4, "C", 1), Seq[Any](5, "D", 5))
      .sortBy(_.mkString("|")))
  }

  test("names_transform casts ragged numeric sub-labels (test_names_transform_numeric)") {
    val d = Seq((1.0, 3.0, 5.0, 0, "X1"), (2.0, 4.0, 6.0, 9, "X2"))
      .toDF("treatment_1.1", "treatment_2.1", "result_1.2", "result_1", "A")
    val out = d.pivotLonger(index = Seq("A"), namesTo = Seq(".value", "colname"),
      namesSep = Some("_"), namesTransform = Map("colname" -> "double"))
    assert(out.columns.sorted.toSeq == Seq("A", "colname", "result", "treatment"))
    val got = out.collect().map(r => (
      r.getString(r.fieldIndex("A")), r.getDouble(r.fieldIndex("colname")),
      if (r.isNullAt(r.fieldIndex("result"))) null else r.getDouble(r.fieldIndex("result")),
      if (r.isNullAt(r.fieldIndex("treatment"))) null else r.getDouble(r.fieldIndex("treatment"))))
      .toSeq.sortBy(t => (t._1, t._2))
    assert(got == Seq(
      ("X1", 1.0, 0.0, null), ("X1", 1.1, null, 1.0),
      ("X1", 1.2, 5.0, null), ("X1", 2.1, null, 3.0),
      ("X2", 1.0, 9.0, null), ("X2", 1.1, null, 2.0),
      ("X2", 1.2, 6.0, null), ("X2", 2.1, null, 4.0)))
  }

  test("expand mixes data-derived groups with literal value sets (test_various)") {
    val d = Seq((1, "r", "Cambridge"), (2, "l", "Shanghai"), (3, "l", "Basel"),
      (1, "r", "Cambridge")).toDF("a", "animals", "cities")
    val out = d.expandMixed(
      groups = Seq(Seq("a"), Seq("animals", "cities")),
      literals = Seq("year" -> Seq(1, 2, 3, 4)))
    assert(out.columns.toSeq == Seq("a", "animals", "cities", "year"))
    // 3 distinct a × 3 observed (animals, cities) combos × 4 years
    assert(out.count() == 36)
    assert(out.where($"a" === 1 && $"animals" === "l" && $"year" === 4).count() == 2)
  }

  test("error contracts: the reference's ValueError surface") {
    val d = dfChecks
    // both names_sep and names_pattern (test_both_names_sep_and_pattern)
    intercept[IllegalArgumentException](d.pivotLonger(index = Seq("famid"),
      namesTo = Seq("a", "b"), namesSep = Some("_"), namesPattern = Some("(.)(.)")))
    // duplicated names_to (test_duplicate_names_to)
    intercept[IllegalArgumentException](d.pivotLonger(index = Seq("famid"),
      namesTo = Seq("a", "a"), namesSep = Some("t")))
    // values_to in names_to (test_values_to_exists_in_names_to)
    intercept[IllegalArgumentException](
      d.pivotLonger(index = Nil, namesTo = Seq("num"), valuesTo = "num"))
    // values_to collides with a column kept in the index (test_values_to_exists_in_columns)
    intercept[IllegalArgumentException](
      d.pivotLonger(index = Seq("birth"), valuesTo = "birth"))
    // names_to intersects index, no .value (test_names_to_index)
    intercept[IllegalArgumentException](
      d.pivotLonger(index = Seq("famid"), namesTo = Seq("famid")))
    // same with names_sep (test_names_sep_pattern_names_to_index)
    intercept[IllegalArgumentException](d.pivotLonger(index = Seq("famid"),
      namesTo = Seq("dim", "famid"), namesSep = Some("t")))
    // .value extract collides with names_to (test_dot_value_names_to_columns_intersect)
    intercept[IllegalArgumentException](d.pivotLonger(index = Seq("famid"),
      namesTo = Seq(".value", "ht"), namesPattern = Some("(.+)(.)")))
    // .value extract collides with index (test_dot_value_names_to_index_intersect)
    intercept[IllegalArgumentException](
      d.withColumnRenamed("famid", "ht").pivotLonger(index = Seq("ht"),
        namesTo = Seq(".value", "num"), namesPattern = Some("(.+)(.)")))
    // sequence values_to intersects index (test_values_to_seq_index_intersect)
    intercept[IllegalArgumentException](ReshapeOps.pivotLongerValuesTo(d,
      index = Seq("famid"), namesTo = Seq("value", "ht"),
      valuesTo = Seq("famid", "foo"), namesPatterns = Seq("ht", "\\d")))
    // a regex in a sequence that claims nothing (test_names_pattern_list_empty_any)
    intercept[IllegalArgumentException](d.pivotLongerMulti(
      index = Seq("famid", "birth"), namesTo = Seq("ht"), namesPatterns = Seq("rar")))
    // string regex matching no / not-all labels (test_names_pattern_no_match,
    // test_names_pattern_incomplete_match — birth fails "(ht)(.)")
    intercept[IllegalArgumentException](d.pivotLonger(index = Seq("famid"),
      namesTo = Seq(".value", "value"), namesPattern = Some("(rar)(.)")))
    intercept[IllegalArgumentException](d.pivotLonger(index = Seq("famid"),
      namesTo = Seq(".value", "value"), namesPattern = Some("(ht)(.)")))
    // names_sep longer than one char is a regex; split arity must match
    // names_to (test_names_sep_len)
    intercept[IllegalArgumentException](
      d.pivotLonger(index = Nil, namesTo = Seq(".value"), namesSep = Some("(\\d)")))
  }

  test("duplicate spec entries raise when non-.value labels exist") {
    // test_dot_value_duplicated_sub_columns — (M, start) appears twice
    val d = Seq(
      (1, 201709, 201905, 202004, 202005, 201803, 201904, 201912, 202007))
      .toDF("id", "M_start_date_1", "M_end_date_1", "M_start_date_2",
        "M_end_date_2", "F_start_date_1", "F_end_date_1", "F_start_date_2",
        "F_end_date_2")
    val e = intercept[IllegalArgumentException](d.pivotLonger(index = Seq("id"),
      namesTo = Seq("cod", ".value"), namesPattern = Some("(.)_(start|end).+")))
    assert(e.getMessage.contains("duplicate entries"))
    // but .value-only duplicates still stack (test_names_pattern_single_column)
    val stacked = singleVal.pivotLonger(index = Seq("id"),
      namesTo = Seq(".value"), namesPattern = Some("(.)."))
    assert(stacked.count() == 6)
  }
}
