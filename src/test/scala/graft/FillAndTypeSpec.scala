package graft

import graft.syntax._
import org.apache.spark.sql.functions._

class FillAndTypeSpec extends SparkSpec {
  import spark.implicits._

  test("fillDirection: down/up/downup per partition") {
    val d = Seq(
      ("a", 1, Option.empty[Double]), ("a", 2, Some(5.0)), ("a", 3, None),
      ("b", 1, Some(1.0)), ("b", 2, None)).toDF("g", "ord", "v")
    def vals(dir: String) = d.fillDirection(Map("v" -> dir), "ord", partitionBy = Seq("g"))
      .orderBy("g", "ord").collect().map(r => if (r.isNullAt(2)) null else r.getDouble(2)).toSeq
    assert(vals("down") == Seq(null, 5.0, 5.0, 1.0, 1.0))
    assert(vals("up") == Seq(5.0, 5.0, null, 1.0, null))
    assert(vals("downup") == Seq(5.0, 5.0, 5.0, 1.0, 1.0))
    assert(vals("updown") == Seq(5.0, 5.0, 5.0, 1.0, 1.0))
  }

  test("impute median and mode") {
    val d = Seq(Some(1.0), Some(3.0), Some(3.0), None).toDF("v")
    assert(d.impute("v", Some("median")).collect().map(_.getDouble(0)).sorted.toSeq ==
      Seq(1.0, 3.0, 3.0, 3.0))
    assert(d.impute("v", Some("mode")).filter(col("v") === 3.0).count() == 3)
    intercept[IllegalArgumentException](d.impute("v"))
  }

  test("coalesceColumns without target writes the first column, keeps the rest") {
    // tests/functions/test_coalesce.py test_coalesce_without_target: the
    // reference assigns outcome into column a and b/c SURVIVE (df.assign)
    val d = Seq((Option.empty[Int], Some(2)), (Some(1), None), (None, None)).toDF("a", "b")
    val out = d.coalesceColumns(Seq("a", "b"), defaultValue = Some(0))
    assert(out.columns.toSeq == Seq("a", "b"))
    assert(out.collect().map(_.getInt(0)).toSeq == Seq(2, 1, 0))
    // empty column list is the identity; a single column raises (resolved
    // against DISTINCT names — the reference's duplicate-label case has no
    // Spark analog, names are unique here)
    assert(d.coalesceColumns(Nil).columns.toSeq == Seq("a", "b"))
    intercept[IllegalArgumentException](d.coalesceColumns(Seq("a")))
  }

  test("changeType keep_values is all-or-nothing at column level (astype errors=ignore)") {
    // any failure → whole column unchanged, dtype included
    val d = Seq("1", "x", "3").toDF("v")
    val kept = d.changeType("v", "int", ignoreException = "keep_values")
    assert(kept.schema("v").dataType == org.apache.spark.sql.types.StringType)
    assert(kept.collect().map(_.getString(0)).toSeq == Seq("1", "x", "3"))
    // full success → column converts to the target dtype; nulls count as castable
    val ok = Seq(Some("1"), None, Some("3")).toDF("v")
      .changeType("v", "int", ignoreException = "keep_values")
    assert(ok.schema("v").dataType == org.apache.spark.sql.types.IntegerType)
    assert(ok.collect().map(r => if (r.isNullAt(0)) null else r.getInt(0)).toSeq ==
      Seq(1, null, 3))
    val filled = d.changeType("v", "int", ignoreException = "fillna")
      .collect().map(r => if (r.isNullAt(0)) null else r.getInt(0)).toSeq
    assert(filled == Seq(1, null, 3))
  }

  test("changeTypes converts a column list, each independently (test_multiple_columns)") {
    val d = Seq((1, 3), (2, 4)).toDF("a", "b").changeTypes(Seq("a", "b"), "string")
    assert(d.schema.fields.forall(_.dataType == org.apache.spark.sql.types.StringType))
    // per-column independence under fillna: the failing column nulls, the
    // clean one converts
    val mixed = Seq(("a", "1"), ("1", "2")).toDF("a", "b")
      .changeTypes(Seq("a", "b"), "int", ignoreException = "fillna")
    val rows = mixed.orderBy("b").collect()
    assert(rows.map(r => if (r.isNullAt(0)) null else r.getInt(0)).toSeq == Seq(null, 1))
    assert(rows.map(_.getInt(1)).toSeq == Seq(1, 2))
  }

  test("currencyColumnToNumeric: the reference doctest frame, both styles") {
    // currency_column_to_numeric.py doctest + test file fixtures
    val d = Seq((" 24.56", ""), ("-", "foo"), ("(12.12)", "1.23 dollars"),
      ("1,000,000", "-1,000 yen")).toDF("a_col", "d_col")
    // accounting: strip/de-comma, parens negative, bare "-" is 0.0
    val acc = d.currencyColumnToNumeric("a_col", Some("accounting"))
      .collect().map(_.getDouble(0)).toSeq
    assert(acc == Seq(24.56, 0.0, -12.12, 1000000.0))
    // default style: extract [-.0-9]; empty and non-numeric -> null
    val dflt = d.currencyColumnToNumeric("d_col")
      .collect().map(r => if (r.isNullAt(1)) null else r.getDouble(1)).toSeq
    assert(dflt == Seq(null, null, 1.23, -1000.0))
    // cast_non_numeric maps exact strings; originally-empty stays null
    val cast = d.currencyColumnToNumeric("d_col",
        castNonNumeric = Map("foo" -> 999.0))
      .collect().map(r => if (r.isNullAt(1)) null else r.getDouble(1)).toSeq
    assert(cast == Seq(null, 999.0, 1.23, -1000.0))
    // fill_all_non_numeric fills coerced values but never originally-empty
    val filled = d.currencyColumnToNumeric("d_col",
        fillAllNonNumeric = Some(995.0))
      .collect().map(r => if (r.isNullAt(1)) null else r.getDouble(1)).toSeq
    assert(filled == Seq(null, 995.0, 1.23, -1000.0))
    // remove_non_numeric drops coerced rows, keeps originally-empty
    val removed = d.currencyColumnToNumeric("d_col",
        castNonNumeric = Map("zz" -> 10.0), removeNonNumeric = true)
    assert(removed.count() == 3)
    assert(removed.select("a_col").collect().map(_.getString(0)).toSet ==
      Set(" 24.56", "(12.12)", "1,000,000"))
    // invalid style raises like the reference ValueError
    intercept[IllegalArgumentException](
      d.currencyColumnToNumeric("a_col", Some("foobar")))
    // faithful accounting: a currency sign the reference would raise on
    // becomes null here (documented engine divergence), plain numbers parse
    val legacy = Seq("$1,234.50", "(99.00)", "12").toDF("amt")
      .currencyColumnToNumeric("amt", Some("accounting"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getDouble(0)).toSeq
    assert(legacy == Seq(null, -99.0, 12.0))
  }

  test("binNumeric clamps edges and preserves nulls") {
    val d = Seq(Some(0.0), Some(49.9), Some(50.0), None).toDF("v")
    val out = d.binNumeric("v", "bin", 0, 50, 10).collect()
      .map(r => if (r.isNullAt(1)) null else r.getInt(1)).toSeq
    assert(out == Seq(0, 9, 9, null))
  }

  test("binNumeric is pd.cut right-closed with include_lowest (r18 differential fix)") {
    // pd.cut(x, np.linspace(0,50,11), labels=False, include_lowest=True):
    // interior EDGE values land in the LOWER bin ((5,10] -> 1), v==lo in
    // bin 0, out-of-range -> NaN — the floor/left-closed convention put 10
    // in bin 2 and clamped 55 into bin 9
    val d = Seq(Some(5.0), Some(10.0), Some(10.1), Some(55.0), Some(-1.0))
      .toDF("v")
    val out = d.binNumeric("v", "bin", 0, 50, 10).collect()
      .map(r => if (r.isNullAt(1)) null else r.getInt(1)).toSeq
    assert(out == Seq(0, 1, 2, null, null))
  }

  test("binNumeric labels: pd.cut labels kwarg with the length check") {
    val d = Seq(Some(0.0), Some(25.0), Some(50.0), None).toDF("v")
    val out = d.binNumeric("v", "bin", 0, 50, 5, labels = Seq("a", "b", "c", "d", "e"))
      .collect().map(r => if (r.isNullAt(1)) null else r.getString(1)).toSeq
    assert(out == Seq("a", "c", "e", null))
    // wrong label count raises (pd.cut ValueError; bin_numeric **kwargs)
    intercept[IllegalArgumentException](
      d.binNumeric("v", "bin", 0, 50, 5, labels = Seq("a", "b")))
  }

  test("binNumericCut matches pd.cut assignment (empirically verified)") {
    // reference run: v=[0,5,10,25,49.9,50], bins=5, labels a..e
    //  -> bins (-0.05,10] (10,20] (20,30] (30,40] (40,50]
    //  -> a, a, a, c, e, e  (10.0 is right-CLOSED into the first bin)
    val d = Seq(Some(0.0), Some(5.0), Some(10.0), Some(25.0), Some(49.9),
      Some(50.0), None).toDF("v")
    val out = d.binNumericCut("v", "bin", 5, labels = Seq("a", "b", "c", "d", "e"))
      .collect().map(r => if (r.isNullAt(1)) null else r.getString(1)).toSeq
    assert(out == Seq("a", "a", "a", "c", "e", "e", null))
    // without labels: the 0-based bin code (Interval dtype divergence)
    val codes = d.binNumericCut("v", "bin", 5)
      .collect().map(r => if (r.isNullAt(1)) null else r.getInt(1)).toSeq
    assert(codes == Seq(0, 0, 0, 2, 4, 4, null))
    // all-null column: every bin null, like pd.cut on all-NaN
    val allNull = Seq[Option[Double]](None, None).toDF("v")
      .binNumericCut("v", "bin", 3).collect().map(_.isNullAt(1)).toSeq
    assert(allNull == Seq(true, true))
    // constant column: single-value range, everything in bin 0
    val const = Seq(7.0, 7.0).toDF("v").binNumericCut("v", "bin", 3)
      .collect().map(_.getInt(1)).toSeq
    assert(const == Seq(0, 0))
    intercept[IllegalArgumentException](d.binNumericCut("v", "bin", 0))
    intercept[IllegalArgumentException](
      d.binNumericCut("v", "bin", 3, labels = Seq("x")))
    // NaN must not poison the edges: pd.cut derives edges from non-NaN
    // values and emits NaN for NaN rows — one NaN in Spark's max() would
    // otherwise make every bin 0
    val withNan = Seq(0.0, 5.0, 10.0, Double.NaN).toDF("v")
      .binNumericCut("v", "bin", 2)
      .collect().map(r => if (r.isNullAt(1)) null else r.getInt(1)).toSeq
    assert(withNan == Seq(0, 0, 1, null))
    // all-NaN behaves like all-null
    val allNan = Seq(Double.NaN, Double.NaN).toDF("v")
      .binNumericCut("v", "bin", 3).collect().map(_.isNullAt(1)).toSeq
    assert(allNan == Seq(true, true))
  }

  test("findReplaceOrdered applies regex patterns in Seq order (>4 entries)") {
    // scala.Map goes hash-ordered above 4 entries; the Seq form keeps the
    // reference dict's insertion order contractual. Patterns cascade: the
    // FIRST matching pattern rewrites the cell, later patterns then see the
    // rewritten value.
    val d = Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta").toDF("s")
    val out = d.findReplaceOrdered("s", Seq(
        ("^a": Any) -> "A", ("^b": Any) -> "B", ("^g": Any) -> "C",
        ("^d": Any) -> "D", ("^e": Any) -> "E", ("^A$": Any) -> "AA"),
        matchMode = "regex")
      .collect().map(_.getString(0)).toSeq
    // 'alpha' -> 'A' (first pattern) -> 'AA' (last pattern sees 'A')
    assert(out == Seq("AA", "B", "C", "D", "E", "zeta"))
    // the Map overload rejects an order-lossy (>4-entry, non-SeqMap) regex
    // mapping instead of silently applying patterns in hash order; a
    // ListMap keeps insertion order and passes
    val lossy = Map(("^a": Any) -> "A", ("^b": Any) -> "B", ("^g": Any) -> "C",
      ("^d": Any) -> "D", ("^e": Any) -> "E")
    val err = intercept[IllegalArgumentException](
      d.findReplace("s", lossy, matchMode = "regex"))
    assert(err.getMessage.contains("order is contractual"))
    val viaListMap = d.findReplace("s",
        scala.collection.immutable.ListMap(lossy.toSeq.sortBy(_._1.toString): _*),
        matchMode = "regex")
      .collect().map(_.getString(0)).toSeq
    assert(viaListMap == Seq("A", "B", "C", "D", "E", "zeta"))
    // exact mode is order-insensitive — the plain Map stays accepted
    d.findReplace("s", lossy, matchMode = "exact").collect()
    // an explicit HashMap is hash-ordered at ANY size — rejected even at 3
    // entries (Map(...) literals up to 4 entries are Map1..Map4, which
    // iterate in construction order, and stay accepted)
    intercept[IllegalArgumentException](
      d.findReplace("s", scala.collection.immutable.HashMap(
        ("^a": Any) -> "A", ("^b": Any) -> "B", ("^g": Any) -> "C"),
        matchMode = "regex"))
    d.findReplace("s", Map(("^a": Any) -> "A", ("^b": Any) -> "B",
      ("^g": Any) -> "C"), matchMode = "regex").collect()
  }

  test("findReplace raises on a null/NaN needle (test_find_replace_null_raises_error)") {
    val d = Seq(Some(1.0), None).toDF("a")
    intercept[IllegalArgumentException](
      d.findReplace("a", Map((Double.NaN: Any) -> 5.0)))
    intercept[IllegalArgumentException](
      d.findReplace("a", Map((null: Any) -> 5.0)))
    // invalid match mode raises (test_find_replace_regex_match_raises_error)
    intercept[IllegalArgumentException](
      d.findReplace("a", Map((1.0: Any) -> 2.0), matchMode = "bla"))
    // regex mode replaces the WHOLE cell on a pattern match
    // (find_replace.py:174-177 str.contains -> assign; the doctest's
    // {'coffee$': 'latte'} turns 'ice coffee' into 'latte', not
    // 'ice latte' — empirically verified against the reference)
    val orders = Seq("ice coffee", "lemonade", "regular coffee").toDF("order")
    val replaced = orders.findReplace("order",
        Map(("coffee$": Any) -> "latte"), matchMode = "regex")
      .collect().map(_.getString(0)).toSeq
    assert(replaced == Seq("latte", "lemonade", "latte"))
  }

  test("encodeCategorical registry reads back") {
    val d = Seq("x").toDF("c").encodeCategorical("c", Seq("x", "y", "z"), ordered = true)
    assert(operators.TypeOps.categoriesOf(d, "c").contains(Seq("x", "y", "z")))
  }

  test("encodeCategoricalOrder: sort and appearance registries") {
    val d = Seq((1, "b"), (2, "a"), (3, "b"), (4, "c"), (5, null))
      .toDF("ord", "k")
    val sorted = d.encodeCategoricalOrder("k", "sort")
    assert(operators.TypeOps.categoriesOf(sorted, "k").contains(Seq("a", "b", "c")))
    val appear = d.encodeCategoricalOrder("k", "appearance", orderCol = Some("ord"))
    assert(operators.TypeOps.categoriesOf(appear, "k").contains(Seq("b", "a", "c")))
    assertThrows[IllegalArgumentException] {
      d.encodeCategoricalOrder("k", "appearance") // no orderCol
    }
    assertThrows[IllegalArgumentException] {
      d.encodeCategoricalOrder("k", "bogus")
    }
  }

  test("truncateDatetime: the reference all-parts table, case-insensitive") {
    // tests/functions/test_truncate_datetime.py: x = 2022-03-21 09:01:15.000666
    val x = java.sql.Timestamp.valueOf("2022-03-21 09:01:15.000666")
    val d = Seq(Tuple1(x)).toDF("dt")
    def t(p: String) = d.truncateDatetime(p).collect()(0).getTimestamp(0).toString
    assert(t("second") == "2022-03-21 09:01:15.0")
    assert(t("minute") == "2022-03-21 09:01:00.0")
    assert(t("HOUR") == "2022-03-21 09:00:00.0")
    assert(t("Day") == "2022-03-21 00:00:00.0")
    assert(t("month") == "2022-03-01 00:00:00.0")
    assert(t("yeaR") == "2022-01-01 00:00:00.0")
    intercept[IllegalArgumentException](d.truncateDatetime("INVALID"))
    // no datetime columns: unchanged, no errors; NaT (null ts) preserved
    val plain = Seq((1, "foo", 1.5, true)).toDF("a", "b", "c", "d")
    assert(plain.truncateDatetime("year").collect()(0) == plain.collect()(0))
    val withNull = Seq(Tuple1(Option.empty[java.sql.Timestamp])).toDF("dt")
    assert(withNull.truncateDatetime("day").collect()(0).isNullAt(0))
  }

  test("convert date family round-trips known anchors") {
    // Excel serial 25569 == 1970-01-01 (origin 1899-12-30)
    val d = Seq(25569L).toDF("serial").convertExcelDate("serial")
    assert(d.collect()(0).getTimestamp(0).toInstant.toString == "1970-01-01T00:00:00Z")
    val m = Seq(719529.5).toDF("dn").convertMatlabDate("dn")
    assert(m.collect()(0).getTimestamp(0).toInstant.toString == "1970-01-01T12:00:00Z")
  }
}
