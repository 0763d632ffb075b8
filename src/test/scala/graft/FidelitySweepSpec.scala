package graft

import graft.operators.{DomainOps, FillOps, TypeOps}
import graft.syntax._
import org.apache.spark.sql.functions._

/** Round-16 continuation of the reference-fidelity sweep: golden ports of
  * tests/functions/test_{fill_direction,min_max_scale,coalesce,flag_nulls,
  * round_to_fraction,impute}.py value cases. Each sweep round so far has
  * surfaced real divergences; this one found two (coalesce without target
  * dropped the surviving source columns; flag_nulls silently overwrote an
  * existing flag column and deferred unknown-column errors to analysis
  * time).
  */
class FidelitySweepSpec extends SparkSpec {
  import spark.implicits._

  // test_fill_direction.py pets fixture; ord = pandas row position
  private def pets = Seq(
    (0, 1, null, "Boston Terrier", "sam"),
    (1, 2, null, "Retrievers (Labrador)", "ogor"),
    (2, 3, null, "Retrievers (Golden)", "nathan"),
    (3, 4, null, "French Bulldogs", null),
    (4, 5, null, "Bulldogs", null),
    (5, 6, "Dog", "Beagles", null),
    (6, 1, null, "Persian", null),
    (7, 2, null, "Maine Coon", "ragnar"),
    (8, 3, null, "Ragdoll", null),
    (9, 4, null, "Exotic", null),
    (10, 5, null, "Siamese", null),
    (11, 6, "Cat", "American Short", "adaora"))
    .toDF("ord", "rank", "pet_type", "breed", "owner")

  private def petTypes(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.orderBy("ord").collect().map(r =>
      if (r.isNullAt(2)) null else r.getString(2)).toSeq

  test("fill_direction: the reference's four directions on the pets frame") {
    // down: nulls before the first value stay null
    assert(petTypes(pets.fillDirection(Map("pet_type" -> "down"), "ord")) ==
      Seq(null, null, null, null, null, "Dog",
        "Dog", "Dog", "Dog", "Dog", "Dog", "Cat"))
    // up: each null takes the next value below
    assert(petTypes(pets.fillDirection(Map("pet_type" -> "up"), "ord")) ==
      Seq("Dog", "Dog", "Dog", "Dog", "Dog", "Dog",
        "Cat", "Cat", "Cat", "Cat", "Cat", "Cat"))
    // updown = bfill then ffill; downup = ffill then bfill
    assert(petTypes(pets.fillDirection(Map("pet_type" -> "updown"), "ord")) ==
      Seq("Dog", "Dog", "Dog", "Dog", "Dog", "Dog",
        "Cat", "Cat", "Cat", "Cat", "Cat", "Cat"))
    assert(petTypes(pets.fillDirection(Map("pet_type" -> "downup"), "ord")) ==
      Seq("Dog", "Dog", "Dog", "Dog", "Dog", "Dog",
        "Dog", "Dog", "Dog", "Dog", "Dog", "Cat"))
    // multiple columns, different directions, one call
    val mixed = pets.fillDirection(
      Map("pet_type" -> "down", "owner" -> "up"), "ord")
      .orderBy("ord").collect()
    assert(mixed.map(_.getString(4)).take(6).toSeq ==
      Seq("sam", "ogor", "nathan", "ragnar", "ragnar", "ragnar"))
    // wrong direction and unknown column raise eagerly
    intercept[IllegalArgumentException](
      pets.fillDirection(Map("pet_type" -> "sideways"), "ord"))
    intercept[IllegalArgumentException](
      pets.fillDirection(Map("ghost" -> "down"), "ord"))
  }

  test("min_max_scale: jointly vs per-column value cases and the range check") {
    // test_min_max_scale_column_name_type over {"a": [5,10], "b": [0,5]}
    val d = Seq((5.0, 0.0), (10.0, 5.0)).toDF("a", "b")
    val joint = TypeOps.minMaxScaleColumns(d, Seq("a", "b"), jointly = true)
      .collect().map(r => (r.getDouble(0), r.getDouble(1)))
    assert(joint.toSeq == Seq((0.5, 0.0), (1.0, 0.5)))
    val each = TypeOps.minMaxScaleColumns(d, Seq("a", "b"), jointly = false)
      .collect().map(r => (r.getDouble(0), r.getDouble(1)))
    assert(each.toSeq == Seq((0.0, 0.0), (1.0, 1.0)))
    // single-column form leaves the other column alone
    val one = TypeOps.minMaxScale(d, "a").collect()
      .map(r => (r.getDouble(0), r.getDouble(1)))
    assert(one.toSeq == Seq((0.0, 0.0), (1.0, 5.0)))
    // feature_range=(1,2) rescales to that interval
    val fr = TypeOps.minMaxScale(d, "a", newMin = 1, newMax = 2).collect()
      .map(_.getDouble(0))
    assert(fr.min == 1.0 && fr.max == 2.0)
    // descending feature_range raises (test_min_max_new_min_max_errors [2,1])
    intercept[IllegalArgumentException](TypeOps.minMaxScale(d, "a", 2, 1))
    intercept[IllegalArgumentException](
      TypeOps.minMaxScaleColumns(d, Seq("a"), 2, 1))
  }

  test("coalesce: reference shape and error contracts") {
    // test_coalesce_without_target: a <- combine_first chain, b/c KEPT
    val d = Seq((Some(1.0), 2.0, Some(2.0)), (None, 3.0, None),
      (Some(3.0), 1.0, Some(9.0))).toDF("a", "b", "c")
    val out = d.coalesceColumns(Seq("a", "b", "c"))
    assert(out.columns.toSeq == Seq("a", "b", "c"))
    assert(out.orderBy("b").select("a").collect().map(_.getDouble(0)).toSeq ==
      Seq(3.0, 1.0, 3.0)) // b=1 -> a=3; b=2 -> a=1; b=3 -> null coalesces to 3
    // test_coalesce_without_delete: default_value fills remaining nulls
    val s = Seq((Option.empty[Double], Option.empty[Double]),
      (None, Some(8.0)), (Some(6.0), Some(7.0))).toDF("s1", "s2")
    val filled = s.coalesceColumns(Seq("s1", "s2"),
      targetColumn = Some("s3"), defaultValue = Some(0.0))
    assert(filled.columns.toSeq == Seq("s1", "s2", "s3"))
    assert(filled.select("s3").collect().map(_.getDouble(0)).sorted.toSeq ==
      Seq(0.0, 6.0, 8.0))
  }

  test("flag_nulls: error contracts and NaN-as-missing") {
    val d = Seq((Some(1.0), "x"), (None, "y")).toDF("v", "s")
    // output name collision raises (test_fail_column_name_in_columns)
    intercept[IllegalArgumentException](d.flagNulls("v"))
    // unknown requested column raises (test_fail_column_val_not_in_columns)
    intercept[IllegalArgumentException](d.flagNulls("nf", Seq("zzz")))
    // NaN in a double column counts as missing, like pandas isna
    val withNan = Seq(1.0, Double.NaN, 3.0).toDF("x")
    assert(withNan.flagNulls("nf").collect().map(_.getInt(1)).toSeq ==
      Seq(0, 1, 0))
  }

  test("round_to_fraction: the reference's Bell__Chart value cases") {
    // conftest dataframe fixture: [1.23452345, 2.456234, 3.2346125] * 3
    val d = Seq(1.23452345, 2.456234, 3.2346125).toDF("bc")
    val half = TypeOps.roundToFraction(d, "bc", 2).collect().map(_.getDouble(0))
    assert(half.toSeq == Seq(1.0, 2.5, 3.0))
    val dig = TypeOps.roundToFraction(d, "bc", 7, digits = Some(3))
      .collect().map(_.getDouble(0))
    assert(dig.toSeq == Seq(1.286, 2.429, 3.286))
    for (bad <- Seq(0.0, -5.0, -0.25))
      intercept[IllegalArgumentException](TypeOps.roundToFraction(d, "bc", bad))
  }

  test("jitter: eager scale/clip validation and clip bounds hold") {
    val d = Seq(1.5, 2.0, 2.5).toDF("a")
    intercept[IllegalArgumentException](
      TypeOps.jitter(d, "a", "a_jitter", scale = -5.0))
    intercept[IllegalArgumentException](
      TypeOps.jitter(d, "a", "a_jitter", scale = 1.0, clip = Some((10.0, 5.0))))
    val clipped = TypeOps.jitter(d, "a", "a_jitter", scale = 1.0,
      clip = Some((1.5, 2.5))).select("a_jitter").collect().map(_.getDouble(0))
    assert(clipped.forall(v => v >= 1.5 && v <= 2.5))
  }

  test("encode_categorical: explicit categories must be non-empty, unique, null-free") {
    val d = Seq("x", "y").toDF("a")
    intercept[IllegalArgumentException](TypeOps.encodeCategorical(d, "a", Nil))
    intercept[IllegalArgumentException](
      TypeOps.encodeCategorical(d, "a", Seq("x", "y", "y")))
    intercept[IllegalArgumentException](
      TypeOps.encodeCategorical(d, "a", Seq("x", null)))
  }

  test("expand_grid: DataFrame-valued others cross-join with key_column names") {
    // test_series_dataframe / test_chain_df: (key, column) MultiIndex maps
    // to flat key_column names; frames cross-join in entry order
    val a = Seq(1, 2).toDF("x")
    val b = Seq(("u", 10.0), ("v", 20.0)).toDF("name", "score")
    val out = graft.operators.ReshapeOps.expandGridFrames(
      Seq("A" -> a, "B" -> b))
    assert(out.columns.toSeq == Seq("A_x", "B_name", "B_score"))
    assert(out.count() == 4)
    assert(out.filter(col("A_x") === 1 && col("B_name") === "v")
      .collect()(0).getDouble(2) == 20.0)
    intercept[IllegalArgumentException](
      graft.operators.ReshapeOps.expandGridFrames(Seq("A" -> a, "A" -> b)))
    intercept[IllegalArgumentException](
      graft.operators.ReshapeOps.expandGridFrames(Nil))
    // empty entries raise eagerly like the reference ValueError
    // (test_expand_grid.py test_series_empty / test_dataframe_empty)
    intercept[IllegalArgumentException](graft.operators.ReshapeOps.expandGrid(
      spark, Seq("x" -> Seq.empty[Any])))
    intercept[IllegalArgumentException](graft.operators.ReshapeOps.expandGridFrames(
      Seq("A" -> Seq(1).toDF("a"), "B" -> Seq(1).toDF("b").filter(lit(false)))))
  }

  test("deconcatenate_column autoname overrides new names with col1..N") {
    // test_deconcatenate_column_autoname
    val d = Seq("1-x", "2-y").toDF("index")
    val out = d.deconcatenateColumn("index", "-", Seq("a", "b"),
      autoname = Some("col"))
    assert(out.columns.toSeq == Seq("index", "col1", "col2"))
    assert(!out.columns.contains("a") && !out.columns.contains("b"))
    assert(out.orderBy("col1").collect()(0).getString(2) == "x")
  }

  test("deconcatenate_column raises only on EXTRA parts; short rows pad, nulls pass") {
    // the reference's str.split(expand=True) pads short rows with NaN and
    // turns null cells into all-NaN rows; it raises only when the expanded
    // width differs from new_column_names (deconcatenate_column.py:132-137)
    // — a row with MORE parts than names guarantees that mismatch, so the
    // lazy codegen guard fires there and only there
    val bad = Seq("a-b-c").toDF("index")
    val err = intercept[Exception](
      bad.deconcatenateColumn("index", "-", Seq("a", "b")).collect())
    assert(err.getMessage.contains("is fewer than") ||
      Option(err.getCause).exists(_.getMessage.contains("is fewer than")))
    // exact-count rows still deconcatenate fine
    val ok = Seq("a-b", "c-d").toDF("index")
      .deconcatenateColumn("index", "-", Seq("p", "q"))
    assert(ok.orderBy("p").collect()(0).getString(2) == "b")
    // a short row pads with nulls (pandas NaN), a null cell passes through
    // as all-null instead of tripping the guard
    val mixed = Seq("a-b", "c", null).toDF("index")
      .deconcatenateColumn("index", "-", Seq("p", "q"))
      .orderBy(asc_nulls_last("index")).collect()
    assert(mixed(0).getString(1) == "a" && mixed(0).getString(2) == "b")
    assert(mixed(1).getString(1) == "c" && mixed(1).isNullAt(2))
    assert(mixed(2).isNullAt(1) && mixed(2).isNullAt(2))
  }

  test("deconcatenate_column strict=true raises on under-width like the reference") {
    // strict opt-in restores the reference's both-direction width check
    // (deconcatenate_column.py:132-137): the whole frame splits to width 2
    // but 3 names were given — the default pads the third with nulls, the
    // strict form raises (SURVEY §7.7 divergence ledger)
    val narrow = Seq("a-b", "c-d").toDF("index")
    val err = intercept[IllegalArgumentException](
      narrow.deconcatenateColumn("index", "-", Seq("p", "q", "r"), strict = true))
    assert(err.getMessage.contains("expanded split width"))
    // exact width passes strict, including with null cells present
    val ok = Seq("a-b", null).toDF("index")
      .deconcatenateColumn("index", "-", Seq("p", "q"), strict = true)
      .orderBy(asc_nulls_last("index")).collect()
    assert(ok(0).getString(1) == "a" && ok(1).isNullAt(1))
    // over-width still raises eagerly under strict
    intercept[IllegalArgumentException](
      Seq("a-b-c").toDF("index")
        .deconcatenateColumn("index", "-", Seq("p", "q"), strict = true))
    // an all-null column expands to ONE all-NaN column in pandas
    // (shape (n, 1)), so strict raises against 2 names — and passes
    // against exactly 1
    val allNull = Seq(null: String, null: String).toDF("index")
    intercept[IllegalArgumentException](
      allNull.deconcatenateColumn("index", "-", Seq("p", "q"), strict = true))
    allNull.deconcatenateColumn("index", "-", Seq("p"), strict = true).collect()
    // an empty frame expands to ZERO columns (shape (0, 0)) — any names raise
    intercept[IllegalArgumentException](
      Seq.empty[String].toDF("index")
        .deconcatenateColumn("index", "-", Seq("p"), strict = true))
  }

  test("log/logit error modes match tests/math/test_log.py and test_logit.py") {
    import graft.functions.MathFunctions
    val s = Seq(0.0, 1.0, 2.0, 3.0, -1.0).toDF("x")
    intercept[RuntimeException](
      MathFunctions.logOf(s, "x", "y", error = "raise").collect())
    val ignored = MathFunctions.logOf(s, "x", "y").orderBy("x").collect()
    // out-of-domain (x <= 0) rows are null; in-domain match ln
    assert(ignored.filter(r => r.getDouble(0) <= 0).forall(_.isNullAt(1)))
    assert(math.abs(ignored.last.getDouble(1) - math.log(3.0)) < 1e-12)
    // warn proceeds with the same values
    val warned = MathFunctions.logOf(s, "x", "y", error = "warn")
      .orderBy("x").collect()
    assert(warned.map(r => if (r.isNullAt(1)) null else r.getDouble(1)).toSeq ==
      ignored.map(r => if (r.isNullAt(1)) null else r.getDouble(1)).toSeq)
    val p = Seq(0.0, 0.1, 0.5, 0.9, 1.0, 2.0).toDF("x")
    intercept[RuntimeException](
      MathFunctions.logitOf(p, "x", "y", error = "raise").collect())
    val lg = MathFunctions.logitOf(p, "x", "y").orderBy("x").collect()
    assert(lg.count(_.isNullAt(1)) == 3) // 0, 1, 2 outside (0,1)
    assert(math.abs(lg(1).getDouble(1) - math.log(0.1 / 0.9)) < 1e-12)
    intercept[IllegalArgumentException](
      MathFunctions.logOf(s, "x", "y", error = "blah"))
  }

  test("row_to_names polars value cases: combined removal flags and the slice-only rule") {
    // tests/polars/functions/test_row_to_names_polars.py fixture, with an
    // explicit ordering column standing in for row position
    val d = (0 until 9).map { i =>
      (i, Seq(1.23452345, 2.456234, 3.2346125)(i % 3),
        i % 3 + 1, Seq("rabbit", "leopard", "lion")(i % 3),
        Seq("Cambridge", "Shanghai", "Basel")(i % 3))
    }.toDF("ord", "Bell__Chart", "decorated-elephant", "animals@#$%^", "cities")
    import graft.operators.NameOps
    // header = row 2; names stringify the row's values
    val hdr = NameOps.rowToNames(d, "ord", Seq(2))
    assert(hdr.columns.toSeq ==
      Seq("2", "3.2346125", "3", "lion", "Basel"))
    // remove_rows + remove_rows_above on a scalar header: rows 0-2 gone,
    // first surviving row is the original row 3
    val both = NameOps.rowToNames(d, "ord", Seq(2),
      removeRows = true, removeRowsAbove = true)
    assert(both.count() == 6)
    assert(both.orderBy(col("2")).collect()(0).getDouble(1) == 1.23452345)
    // slice(2,4) with remove_rows_above only: header rows stay as data
    val above = NameOps.rowToNames(d, "ord", Seq(2, 3), removeRowsAbove = true)
    assert(above.count() == 7)
    // slice(2,4) with both: first surviving row is original row 4
    val both2 = NameOps.rowToNames(d, "ord", Seq(2, 3),
      removeRows = true, removeRowsAbove = true)
    assert(both2.count() == 5)
    assert(both2.orderBy(both2.columns.head).collect()(0).getDouble(1) == 2.456234)
    // non-consecutive list + remove_rows_above raises (slice-only rule)
    intercept[IllegalArgumentException](
      NameOps.rowToNames(d, "ord", Seq(1, 3), removeRowsAbove = true))
  }

  test("select_columns: multiple DropLabels act as one unit (select.py:800-807)") {
    import graft.ColumnSelector._
    val d = Seq((1, 1.2, 1, "rabbit", "Cambridge"))
      .toDF("a", "Bell__Chart", "decorated-elephant", "animals@#$%^", "cities")
    // test_select_column_names_droplabel_multiple: [DropLabel(a),
    // DropLabel(Bell__Chart), DropLabel(cities)] = drop all three
    val out = graft.operators.SelectOps.selectColumns(d,
      Seq(Not(Exact("a")), Not(Exact("Bell__Chart")), Not(Exact("cities"))))
    assert(out.columns.toSeq == Seq("decorated-elephant", "animals@#$%^"))
    // a single DropLabel keeps its plain complement meaning
    val single = graft.operators.SelectOps.selectColumns(d, Seq(Not(Exact("a"))))
    assert(single.columns.toSeq ==
      Seq("Bell__Chart", "decorated-elephant", "animals@#$%^", "cities"))
    // mixed list: positive entries first, merged complement appended last
    val mixed = graft.operators.SelectOps.selectColumns(d,
      Seq(Exact("cities"), Not(Exact("a")), Not(Exact("Bell__Chart"))))
    assert(mixed.columns.head == "cities")
    assert(mixed.columns.toSet ==
      Set("cities", "decorated-elephant", "animals@#$%^"))
  }

  test("groupby_topk / sort_column_value_order / factorize eager error contracts") {
    import graft.operators.{GroupedOps, TypeOps}
    val d = Seq(("pass", 30, 1), ("fail", 50, 2), ("pass", 20, 3))
      .toDF("result", "age", "id")
    intercept[IllegalArgumentException](
      GroupedOps.groupbyTopk(d, Seq("RESULT"), "age", 3))
    intercept[IllegalArgumentException](
      GroupedOps.groupbyTopk(d, Seq("result"), "Age", 3))
    intercept[IllegalArgumentException](
      GroupedOps.groupbyTopk(d, Seq("result"), "age", -2))
    intercept[IllegalArgumentException](
      GroupedOps.sortColumnValueOrder(d, "", Seq("pass")))
    intercept[IllegalArgumentException](
      GroupedOps.sortColumnValueOrder(d, "result", Nil))
    intercept[IllegalArgumentException](
      TypeOps.factorizeColumns(d, "c", "id"))
  }

  test("factorize: null/NaN gets -1 and never occupies a code slot (pd.factorize parity)") {
    import graft.operators.TypeOps
    // empirically verified against the reference: ['b', None, 'a', 'c', 'b']
    // factorizes to [0, -1, 1, 2, 0] — the null neither shifts later codes
    // nor gets a null code
    val d = Seq((1, Some("b")), (2, None), (3, Some("a")), (4, Some("c")),
      (5, Some("b"))).toDF("ord", "foo")
    val out = TypeOps.factorizeColumns(d, "foo", "ord")
      .orderBy("ord").collect().map(_.getInt(2)).toSeq
    assert(out == Seq(0, -1, 1, 2, 0))
    // double NaN behaves like null (pandas isna)
    val dd = Seq((1, 2.0), (2, Double.NaN), (3, 5.0), (4, 2.0)).toDF("ord", "x")
    val outD = TypeOps.factorizeColumns(dd, "x", "ord")
      .orderBy("ord").collect().map(_.getInt(2)).toSeq
    assert(outD == Seq(0, -1, 1, 0))
  }

  test("impute: statistic aliases match the reference's expected sets") {
    // missingdata a = [1, 2, null] * 3
    val d = Seq(Some(1.0), Some(2.0), None, Some(1.0), Some(2.0), None,
      Some(1.0), Some(2.0), None).toDF("a")
    def vals(stat: String): Set[Double] =
      d.impute("a", statistic = Some(stat)).collect().map(_.getDouble(0)).toSet
    assert(vals("mean") == Set(1.0, 2.0, 1.5))
    assert(vals("average") == Set(1.0, 2.0, 1.5))
    assert(vals("median") == Set(1.0, 2.0, 1.5))
    assert(vals("minimum") == Set(1.0, 2.0)) // fills with 1
    assert(vals("maximum") == Set(1.0, 2.0)) // fills with 2
    // exactly-one-of contract (both / neither raise)
    intercept[IllegalArgumentException](
      d.impute("a", statistic = Some("mean"), value = Some(0.0)))
    intercept[IllegalArgumentException](d.impute("a"))
    intercept[IllegalArgumentException](d.impute("a", statistic = Some("foobar")))
  }

  test("count_cumulative_unique: case_sensitive=False rejects non-string columns") {
    // test_count_cumulative_unique.py test_not_case_sensitive_but_nonstring —
    // the reference raises TypeError rather than silently coercing
    val d = Seq((1, "A"), (2, "b"), (3, "A")).toDF("notok", "ok")
    intercept[IllegalArgumentException](
      d.countCumulativeUnique("notok", "ok", "cum", caseSensitive = false))
    // string columns stay fine either way
    assert(d.countCumulativeUnique("ok", "notok", "cum", caseSensitive = false)
      .orderBy("notok").collect().map(_.getLong(2)).toSeq == Seq(1L, 2L, 2L))
  }

  test("expand_column: sep defaults to '|' (test_sep_default_parameter)") {
    val d = Seq((1, "a|b"), (2, "b|c")).toDF("id", "col")
    val out = d.expandColumn("col")
    assert(out.columns.toSeq == Seq("id", "col", "a", "b", "c"))
    assert(out.orderBy("id").collect().map(r =>
      (r.getInt(r.fieldIndex("a")), r.getInt(r.fieldIndex("b")),
        r.getInt(r.fieldIndex("c")))).toSeq == Seq((1, 1, 0), (0, 1, 1)))
  }
}
