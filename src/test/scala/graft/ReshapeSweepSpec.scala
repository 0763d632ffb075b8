package graft

import graft.syntax._
import org.apache.spark.sql.functions._

/** Round-17 fidelity sweep over tests/functions/test_complete.py (731 LoC)
  * and test_pivot_wider.py (716 LoC) — the reshape twins of the r16
  * pivot_longer sweep. Golden value ports of every literal expected frame
  * plus the error contracts; the hypothesis-generated cases reduce to the
  * same kernels.
  */
class ReshapeSweepSpec extends SparkSpec {
  import spark.implicits._

  // test_complete.py fill_df fixture
  private def fillDf = Seq(
    (1, 1, "a", Some(1.0), 4),
    (2, 2, "a", None, 5),
    (1, 2, "b", Some(3.0), 6),
    (2, 3, "b", Some(4.0), 7))
    .toDF("group", "item_id", "item_name", "value1", "value2")

  private def taxonomy = Seq(
    (1999, "Saccharina", 4), (2000, "Saccharina", 5), (2004, "Saccharina", 2),
    (1999, "Agarum", 1), (2004, "Agarum", 8))
    .toDF("Year", "Taxon", "Abundance")

  test("complete_multiple_groupings golden (test_complete.py:407)") {
    val df3 = Seq(
      (1, "A", "d", 3, 2), (1, "A", "e", 3, 1), (1, "B", "h", 3, 3),
      (1, "B", "i", 3, 2), (2, "A", "d", 2, 1), (2, "B", "i", 2, 1),
      (2, "C", "k", 2, 2))
      .toDF("project_id", "meta", "domain1", "question_count", "tag_count")
    val got = df3.completeNested(
      Seq(Seq("meta", "domain1"), Seq("project_id", "question_count")),
      fillValue = Map("tag_count" -> 0))
      .orderBy("meta", "domain1", "project_id")
      .select("project_id", "meta", "domain1", "question_count", "tag_count")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getInt(3), r.getInt(4))).toSeq
    val expected = Seq(
      (1, "A", "d", 3, 2), (2, "A", "d", 2, 1),
      (1, "A", "e", 3, 1), (2, "A", "e", 2, 0),
      (1, "B", "h", 3, 3), (2, "B", "h", 2, 0),
      (1, "B", "i", 3, 2), (2, "B", "i", 2, 1),
      (1, "C", "k", 3, 0), (2, "C", "k", 2, 2))
    assert(got === expected)
  }

  test("explicit=False dict fill golden (test_explicit_dict)") {
    val got = fillDf.completeNested(
      Seq(Seq("group"), Seq("item_id", "item_name")),
      fillValue = Map("value1" -> 0.0, "value2" -> 99),
      explicitOnlyNew = true)
      .orderBy("group", "item_id", "item_name")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getString(2),
        if (r.isNullAt(3)) null else r.getDouble(3),
        r.getInt(4))).toSeq
    val expected = Seq(
      (1, 1, "a", 1.0, 4), (1, 2, "a", 0.0, 99), (1, 2, "b", 3.0, 6),
      (1, 3, "b", 0.0, 99), (2, 1, "a", 0.0, 99), (2, 2, "a", null, 5),
      (2, 2, "b", 0.0, 99), (2, 3, "b", 4.0, 7))
    assert(got === expected)
  }

  test("fill on combination columns is ignored; column order preserved (test_explicit_)") {
    val trimmed = fillDf.select("group", "item_id", "item_name")
    val got = trimmed.completeNested(
      Seq(Seq("group"), Seq("item_id", "item_name")),
      fillValue = Map("group" -> 0, "item_id" -> 0, "item_name" -> "x"),
      explicitOnlyNew = true)
    assert(got.columns.toSeq === Seq("group", "item_id", "item_name"))
    assert(got.count() === 8)
    // no nulls and no injected fill values — combination cols never filled
    assert(got.filter(col("item_name") === "x").count() === 0)
    // full output column order follows the original frame (complete.py:303)
    assert(fillDf.complete(Seq("group", "item_id")).columns.toSeq ===
      fillDf.columns.toSeq)
  }

  test("null combination keys stay attached to their rows (test_nulls)") {
    // value1 has a null: pandas keeps NaN as a real key level, so the
    // (null value1, 5 value2) row must keep group=2/item_id=2/item_name=a
    val got = fillDf.complete(Seq("value1", "value2"))
    assert(got.count() === 16) // 4 value1 levels (incl null) x 4 value2
    val nullRow = got.filter(col("value1").isNull && col("value2") === 5)
      .collect()
    assert(nullRow.length === 1)
    assert(nullRow(0).getAs[Int]("group") === 2)
    assert(nullRow(0).getAs[String]("item_name") === "a")
  }

  test("literal universes union with observed values (test_dict_seq / test_MI_1)") {
    // provided values missing an observed one: the observed row survives
    // (the reference merges how="outer", complete.py:292)
    val df = Seq((1, "a"), (5, "e")).toDF("x", "tag")
    val got = df.completeNested(Seq.empty[Seq[String]],
      literals = Seq("x" -> Seq(1, 2, 3, 4)))
    assert(got.select("x").orderBy("x").collect().map(_.getInt(0)).toSeq ===
      Seq(1, 2, 3, 4, 5))
    // dict + seq (test_dict_seq): years 1999..2004 x observed (Taxon,
    // Abundance) pairs = 30 combos, no value columns left to fill
    val tax = taxonomy.completeNested(Seq(Seq("Taxon", "Abundance")),
      literals = Seq("Year" -> Seq(2000, 1999, 2001, 2002, 2003, 2004)))
    assert(tax.count() === 30)
    assert(tax.columns.toSeq === taxonomy.columns.toSeq)
  }

  test("fill_value scalar across value columns (test_fill_value_scalar)") {
    val got = taxonomy.complete(Seq("Year", "Taxon"),
      fillValue = Map("Abundance" -> 0))
      .orderBy("Year", "Taxon")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getInt(2))).toSeq
    assert(got === Seq(
      (1999, "Agarum", 1), (1999, "Saccharina", 4),
      (2000, "Agarum", 0), (2000, "Saccharina", 5),
      (2004, "Agarum", 8), (2004, "Saccharina", 2)))
  }

  test("completeRange matches the reference groupby callable (test_complete_groupby)") {
    val df = Seq(
      ("CA", 2010, 1), ("CA", 2013, 3), ("HI", 2010, 1), ("HI", 2012, 2),
      ("HI", 2016, 3), ("NY", 2009, 2), ("NY", 2013, 5))
      .toDF("state", "year", "value")
    val got = df.completeRange("year", by = Seq("state"))
      .orderBy("state", "year")
      .collect().map(r => (r.getString(0), r.getInt(1),
        if (r.isNullAt(2)) -1 else r.getInt(2))).toSeq
    val expected =
      (2010 to 2013).map(y => ("CA", y, Map(2010 -> 1, 2013 -> 3).getOrElse(y, -1))) ++
      (2010 to 2016).map(y => ("HI", y, Map(2010 -> 1, 2012 -> 2, 2016 -> 3).getOrElse(y, -1))) ++
      (2009 to 2013).map(y => ("NY", y, Map(2009 -> 2, 2013 -> 5).getOrElse(y, -1)))
    assert(got === expected)
  }

  test("complete by-group universes never leak across groups (test_groupby_tuple)") {
    val df = Seq(
      (1, "A", "1999-01-01"), (1, "A", "1999-02-01"), (1, "A", "1999-03-01"),
      (1, "A", "1999-04-01"), (1, "B", "1999-01-01"), (1, "B", "1999-02-01"),
      (1, "B", "1999-03-01"),
      (2, "C", "2000-01-01"), (2, "C", "2000-02-01"), (2, "C", "2000-03-01"),
      (2, "D", "2000-01-01"), (2, "D", "2000-02-01"), (2, "D", "2000-03-01"),
      (2, "D", "2000-04-01"))
      .toDF("cell", "site", "date")
    val got = df.completeNested(Seq(Seq("date"), Seq("site")),
      by = Seq("cell"))
    // grid 1: 4 dates x 2 sites = 8; grid 2: 4 dates x 2 sites = 8
    assert(got.count() === 16)
    // site C never pairs with a 1999 date
    assert(got.filter(col("site") === "C" && col("date").startsWith("1999"))
      .count() === 0)
  }

  test("complete error contracts (test_fill_value_column / unknown specs)") {
    intercept[IllegalArgumentException](
      fillDf.complete(Seq("group"), fillValue = Map("cities" -> 0)))
    intercept[IllegalArgumentException](
      fillDf.completeNested(Seq(Seq("group")), literals = Seq("nope" -> Seq(1))))
    intercept[IllegalArgumentException](
      fillDf.completeNested(Seq(Seq("group"), Seq("group"))))
  }

  test("expand by-group golden incl null universe members (test_expand.py:104)") {
    val df = Seq(
      (1, "FirmA", Some("FirmB"), "FirmC"),
      (1, "FirmD", None, "FirmE"),
      (2, "FirmA", None, "FirmC"),
      (2, "FirmD", None, "FirmE"),
      (2, "FirmG", Some("FirmF"), "FirmE"))
      .toDF("dealid", "acquirer", "target", "vendor")
    val got = df.expandBy(Seq("dealid"), Seq("acquirer", "target", "vendor"))
    assert(got.count() === 20) // deal1: 2x2x2; deal2: 3x2x2
    // null target is a REAL universe member within each deal group
    assert(got.filter(col("dealid") === 1 && col("target").isNull).count() === 4)
    assert(got.filter(col("dealid") === 2 && col("acquirer") === "FirmG" &&
      col("target") === "FirmF" && col("vendor") === "FirmC").count() === 1)
    // universes never leak across groups: FirmG is deal-2 only
    assert(got.filter(col("dealid") === 1 && col("acquirer") === "FirmG")
      .count() === 0)
  }

  test("expand mixed units: observed groups x literal ranges (test_various)") {
    val df = Seq((1, "ny"), (1, "la"), (2, "ny")).toDF("a", "city")
    val got = df.expandMixed(
      groups = Seq(Seq("a"), Seq("city")),
      literals = Seq("year" -> Seq(1, 2, 3, 4)))
    assert(got.count() === 2L * 2 * 4)
    assert(got.columns.toSeq === Seq("a", "city", "year"))
  }

  test("cartesian_product: raw-row cross, duplicate labels raise (test_cartesian_product.py)") {
    import graft.operators.ReshapeOps
    val a = Seq(1, 1, 2).toDF("x") // duplicates kept, not distinct'd
    val b = Seq("p", "q").toDF("y")
    val got = ReshapeOps.cartesianProduct(Seq(a, b))
    assert(got.count() === 6)
    assert(got.columns.toSeq === Seq("x", "y"))
    assert(got.filter(col("x") === 1 && col("y") === "p").count() === 2)
    intercept[IllegalArgumentException](
      ReshapeOps.cartesianProduct(Seq(a, a)))
    intercept[IllegalArgumentException](
      ReshapeOps.cartesianProduct(Nil))
  }

  // ---- pivot_wider ----

  private def checksOutput = Seq(
    (1, "Alabama", "pop_renter", 1434765, 16736),
    (1, "Alabama", "median_rent", 747, 3),
    (13, "Georgia", "pop_renter", 3592422, 33385),
    (13, "Georgia", "median_rent", 927, 3))
    .toDF("geoid", "name", "variable", "estimate", "error")

  test("pivot_wider raises on non-unique index+names_from (test_non_unique_...)") {
    val df = Seq(("A", "L", 30), ("A", "L", 54), ("A", "L", 25))
      .toDF("A", "L", "numbers")
    val thrown = intercept[Exception](
      df.pivotWider(Seq("A"), "L", "numbers").collect())
    assert(thrown.getMessage.contains("duplicate") ||
      Option(thrown.getCause).exists(_.getMessage.contains("duplicate")))
  }

  test("pivot_wider index_names golden (test_index_names)") {
    val df = Seq(("mean", 4, "var1"), ("sd", 7, "var1"), ("mean", 1, "var2"),
      ("sd", 2, "var2"), ("mean", 11, "var3"), ("sd", 14, "var3"))
      .toDF("stat", "score", "var")
    val got = df.pivotWider(Seq("var"), "stat", "score")
      .orderBy("var")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2))).toSeq
    assert(got === Seq(("var1", 4, 7), ("var2", 1, 2), ("var3", 11, 14)))
  }

  test("pivot_wider names_glue golden (test_names_glue)") {
    val df = Seq(("Kelly", "Mark", "1"), ("Kelly", "Scott", "2"),
      ("Quin", "Tegan", "1"), ("Quin", "Sara", "2"))
      .toDF("family", "name", "n")
    val got = df.pivotWider(Seq("family"), "n", "name", namesGlue = "name{n}")
    assert(got.columns.toSeq === Seq("family", "name1", "name2"))
    val rows = got.orderBy("family").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSeq
    assert(rows === Seq(("Kelly", "Mark", "Scott"), ("Quin", "Tegan", "Sara")))
  }

  test("pivot_wider multi-level names_glue golden (test_names_glue_multiple_levels)") {
    val got = checksOutput.pivotWiderMulti(Seq("geoid", "name"), "variable",
      Seq("estimate", "error"), namesGlue = "{variable}_{_value}",
      knownValues = Seq("pop_renter", "median_rent"))
      .orderBy("geoid")
    assert(got.columns.toSeq === Seq("geoid", "name",
      "pop_renter_estimate", "pop_renter_error",
      "median_rent_estimate", "median_rent_error"))
    val rows = got.collect().map(r => (r.getInt(0), r.getString(1),
      r.getInt(2), r.getInt(3), r.getInt(4), r.getInt(5))).toSeq
    assert(rows === Seq(
      (1, "Alabama", 1434765, 16736, 747, 3),
      (13, "Georgia", 3592422, 33385, 927, 3)))
  }

  test("pivot_wider int names_from + names_sep golden (test_int_columns)") {
    val df = Seq((1, 10, 0.1), (2, 20, 0.2), (3, 30, 0.3))
      .toDF("name", "n", "pct").withColumn("num", lit(0))
    val got = df.pivotWiderMulti(Seq("num"), "name", Seq("n", "pct"))
    assert(got.columns.toSet === Set("num", "n_1", "n_2", "n_3",
      "pct_1", "pct_2", "pct_3"))
    val r = got.collect()(0)
    assert(r.getAs[Int]("n_2") === 20 && r.getAs[Double]("pct_3") === 0.3)
  }

  test("pivot_wider categorical/int levels become labels (test_categorical)") {
    val df = Seq(("Kelly", "Mark", 1), ("Kelly", "Scott", 2),
      ("Quin", "Tegan", 1), ("Quin", "Sara", 2))
      .toDF("family", "name", "n")
    val got = df.pivotWider(Seq("family"), "n", "name")
    assert(got.columns.toSeq === Seq("family", "1", "2"))
  }

  test("pivot_wider -> pivot_longer roundtrip (test_pivot_long_wide_long)") {
    val dfIn = Seq((1, 2, "ben", 22, 5, 13), (1, 2, "dave", 23, 4, 11))
      .toDF("a", "b", "name", "points", "marks", "sets")
    val wide = dfIn.pivotWiderMulti(Seq("a", "b"), "name",
      Seq("points", "marks", "sets"))
    assert(wide.columns.toSet === Set("a", "b", "points_ben", "points_dave",
      "marks_ben", "marks_dave", "sets_ben", "sets_dave"))
    val back = wide.pivotLonger(Seq("a", "b"),
      namesTo = Seq(".value", "name"), namesSep = Some("_"))
    assert(sorted(back.select("a", "b", "name", "points", "marks", "sets")) ===
      sorted(dfIn))
  }

  test("pivot_wider index_expand reindexes over the category registry (test_index_expand)") {
    // df_expand analog: id is categorical over {1,2,3} but only 1,2 observed
    val df = graft.operators.TypeOps.encodeCategorical(
      Seq((2, 2018, 30), (1, 2018, 40), (1, 2019, 50), (2, 2020, 60), (1, 2020, 70))
        .toDF("id", "year", "percentage"),
      "id", Seq("1", "2", "3"), ordered = true)
    val got = df.pivotWider(Seq("id"), "year", "percentage",
      knownValues = Seq("2018", "2019", "2020"), indexExpand = true)
    assert(got.count() === 3)
    val id3 = got.filter(col("id") === 3).collect()
    assert(id3.length === 1 && (1 to 3).forall(i => id3(0).isNullAt(i)))
    // no registry -> eager raise
    intercept[IllegalArgumentException](
      Seq((1, 2018, 30)).toDF("id", "year", "percentage")
        .pivotWider(Seq("id"), "year", "percentage", indexExpand = true))
  }

  test("pivot_wider duplicate-safe when an aggregate is requested") {
    val df = Seq(("A", "L", 30), ("A", "L", 54), ("A", "M", 25))
      .toDF("A", "L", "numbers")
    val got = df.pivotWider(Seq("A"), "L", "numbers", agg = "sum")
      .collect()(0)
    assert(got.getAs[Long]("L") === 84L && got.getAs[Long]("M") === 25L)
  }
}
