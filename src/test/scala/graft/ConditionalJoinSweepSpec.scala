package graft

import graft.operators.JoinOps
import graft.syntax._
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Round-17 fidelity sweep over the reference's largest test surface:
  * tests/functions/test_conditional_join.py (5,197 LoC). The reference tests
  * are hypothesis property tests whose expected values come from a pandas
  * cross-join + mask (or merge/merge_asof); this spec re-expresses that
  * oracle as a pure driver-side Scala enumerator with numpy/pandas
  * comparison semantics spelled out explicitly — NaN/null `!=` anything is
  * a match (utils.py:_not_equal_indices), merge pairs NaN equi-keys
  * (pandas merge factorizes NaN as a key), `< <= > >=` never match nulls —
  * and runs conditionalJoin against it across the op/how/keep/indicator/
  * df_columns matrix on deterministic frames shaped like the reference's
  * conditional_df/conditional_right strategies.
  *
  * Documented divergence (SURVEY §7.7): keep=first/last resolves ties by
  * right join-column VALUE order (then the remaining right columns), not
  * pandas row position — positions have no distributed meaning. The oracle
  * here encodes the value-order rule.
  */
class ConditionalJoinSweepSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(42)
  private def ts(day: Int, hour: Int = 0): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(f"2020-01-${1 + (day % 28)}%02d $hour%02d:00:00")

  // conditional_df analog: A int, B float-with-nulls, C text, D bool, E datetime
  private lazy val leftDf: DataFrame = {
    val rows = (0 until 37).map { i =>
      (i.toLong,
        rnd.nextLong(11),
        if (rnd.nextInt(5) == 0) None else Some(rnd.nextInt(21) / 2.0),
        s"s${rnd.nextInt(6)}",
        rnd.nextBoolean(),
        ts(rnd.nextInt(10), rnd.nextInt(4)))
    }
    rows.toDF("lid", "A", "B", "C", "D", "E")
  }

  // conditional_right analog: Integers, Numeric (nulls), Floats, Strings,
  // Booleans, Dates, Dates_Right
  private lazy val rightDf: DataFrame = {
    val rows = (0 until 29).map { i =>
      (i.toLong,
        rnd.nextLong(11),
        if (rnd.nextInt(5) == 0) None else Some(rnd.nextInt(21) / 2.0),
        rnd.nextInt(21) / 2.0,
        s"s${rnd.nextInt(6)}",
        rnd.nextBoolean(),
        ts(rnd.nextInt(10), rnd.nextInt(4)),
        ts(rnd.nextInt(10), rnd.nextInt(4)))
    }
    rows.toDF("rid", "Integers", "Numeric", "Floats", "Strings", "Booleans",
      "Dates", "Dates_Right")
  }

  // ---- driver-side oracle with explicit pandas/numpy semantics ----

  private def num(a: Any): Double = a match {
    case x: Long => x.toDouble
    case x: Int => x.toDouble
    case x: Double => x
    case x: java.sql.Timestamp => x.getTime.toDouble
    case x: Boolean => if (x) 1.0 else 0.0
    case _ => Double.NaN
  }

  private def matches(l: Any, r: Any, op: String): Boolean = op match {
    case "==" =>
      if (l == null || r == null) l == null && r == null
      else if (l.isInstanceOf[String]) l == r
      else num(l) == num(r)
    case "!=" =>
      if (l == null || r == null) true
      else if (l.isInstanceOf[String]) l != r
      else num(l) != num(r)
    case _ =>
      if (l == null || r == null) false
      else op match {
        case "<" => num(l) < num(r)
        case "<=" => num(l) <= num(r)
        case ">" => num(l) > num(r)
        case ">=" => num(l) >= num(r)
      }
  }

  /** value-order key used by the engine's keep contract: right join
    * columns (condition order, distinct) then every remaining right column.
    */
  private def keepKey(row: Seq[Any], cols: Seq[String], schema: Seq[String],
      conds: Seq[JoinOps.Cond]): Seq[Any] = {
    val condCols = conds.map(_._2).distinct
    val ordered = condCols ++ schema.filterNot(condCols.contains(_))
    ordered.map(c => row(schema.indexOf(c)))
  }

  private def lessKey(a: Seq[Any], b: Seq[Any], desc: Boolean): Boolean = {
    var i = 0
    while (i < a.length) {
      val (x, y) = (a(i), b(i))
      if (x == null && y != null) return false // nulls last either way
      if (x != null && y == null) return true
      if (x != null && y != null) {
        val c =
          if (x.isInstanceOf[String]) x.toString.compareTo(y.toString)
          else if (x.isInstanceOf[Boolean])
            java.lang.Boolean.compare(x.asInstanceOf[Boolean], y.asInstanceOf[Boolean])
          else java.lang.Double.compare(num(x), num(y))
        if (c != 0) return (if (desc) -c else c) < 0
      }
      i += 1
    }
    false
  }

  /** Independent expected-row enumerator: cross-enumerate, mask with
    * pandas semantics, apply keep per left row, assemble how.
    */
  private def expectedRows(left: DataFrame, right: DataFrame,
      conds: Seq[JoinOps.Cond], how: String = "inner", keep: String = "all",
      indicator: Boolean = false): Seq[Seq[Any]] = {
    val lSchema = left.columns.toSeq
    val rSchema = right.columns.toSeq
    val lRows = left.collect().toSeq.map(r => (0 until r.length).map(r.get))
    val rRows = right.collect().toSeq.map(r => (0 until r.length).map(r.get))
    val pairs = for {
      lr <- lRows
      rr <- rRows
      if conds.forall { case (lc, rc, op) =>
        matches(lr(lSchema.indexOf(lc)), rr(rSchema.indexOf(rc)), op) }
    } yield (lr, rr)
    val kept = if (keep == "all") pairs else {
      pairs.groupBy(_._1).toSeq.flatMap { case (_, ps) =>
        val sortedPs = ps.sortWith((a, b) =>
          lessKey(keepKey(a._2, rSchema, rSchema, conds),
            keepKey(b._2, rSchema, rSchema, conds), keep == "last"))
        Seq(sortedPs.head)
      }
    }
    val nullsL = Seq.fill[Any](lSchema.length)(null)
    val nullsR = Seq.fill[Any](rSchema.length)(null)
    val matchedL = kept.map(_._1).toSet
    val matchedR = kept.map(_._2).toSet
    // a left row equal by value to a matched one counts as matched — value
    // identity is all a distributed engine (and a sorted compare) can see;
    // the fixtures carry a unique lid/rid column so this is exact here
    val out = kept.map { case (l, r) => (l ++ r, "both") } ++
      (if (how == "left" || how == "outer")
        lRows.filterNot(matchedL.contains).map(l => (l ++ nullsR, "left_only"))
      else Nil) ++
      (if (how == "right" || how == "outer")
        rRows.filterNot(matchedR.contains).map(r => (nullsL ++ r, "right_only"))
      else Nil)
    if (indicator) out.map { case (row, m) => row :+ (m: Any) } else out.map(_._1)
  }

  private def canon(rows: Seq[Seq[Any]]): Seq[String] =
    rows.map(_.map {
      case null => "∅"
      case d: Double => f"$d%.6f"
      case x => String.valueOf(x)
    }.mkString("|")).sorted

  private def check(conds: Seq[JoinOps.Cond], how: String = "inner",
      keep: String = "all", indicator: Boolean = false): Unit = {
    val actual = leftDf.conditionalJoin(rightDf, conds, how, keep, indicator)
    assert(canon(rowsOf(actual)) ===
      canon(expectedRows(leftDf, rightDf, conds, how, keep, indicator)),
      s"conds=$conds how=$how keep=$keep")
  }

  // ---- single-condition matrix (test_single_condition_*) ----

  test("single < on floats with nulls (test_single_condition_less_than_floats)") {
    check(Seq(("B", "Numeric", "<")))
  }
  test("single <= on floats (test_single_condition_less_than_equal)") {
    check(Seq(("B", "Numeric", "<=")))
  }
  test("single < on ints (test_single_condition_less_than_ints)") {
    check(Seq(("A", "Integers", "<")))
  }
  test("single > on ints (test_single_condition_greater_than_ints)") {
    check(Seq(("A", "Integers", ">")))
  }
  test("single > int vs float (test_single_condition_greater_than_floats_floats)") {
    check(Seq(("A", "Floats", ">")))
  }
  test("single < on dates (test_single_condition_less_than_date)") {
    check(Seq(("E", "Dates", "<")))
  }
  test("single > on datetimes (test_single_condition_greater_than_datetime)") {
    check(Seq(("E", "Dates", ">")))
  }
  test("single != ints (test_single_condition_not_equal_ints)") {
    check(Seq(("A", "Integers", "!=")))
  }
  test("single != floats with nulls on both sides (test_single_condition_not_equal_floats_only)") {
    check(Seq(("B", "Numeric", "!=")))
  }
  test("single != datetimes (test_single_condition_not_equal_datetime)") {
    check(Seq(("E", "Dates", "!=")))
  }

  // ---- how + keep (test_how_left/right, *_keep_first/last) ----

  test("how=left single < (test_how_left)") {
    check(Seq(("A", "Integers", "<")), how = "left")
  }
  test("how=right single < (test_how_right)") {
    check(Seq(("A", "Integers", "<")), how = "right")
  }
  test("keep=first single < floats (test_single_condition_less_than_floats_keep_first)") {
    check(Seq(("B", "Numeric", "<")), how = "left", keep = "first")
  }
  test("keep=last single > floats (test_single_condition_greater_than_floats_keep_last)") {
    check(Seq(("B", "Numeric", ">")), how = "left", keep = "last")
  }
  test("keep=first is the forward merge_asof match (value-order contract)") {
    // left-join keep=first on B < Numeric must attach the SMALLEST strictly
    // greater Numeric — merge_asof(direction=forward, allow_exact=False)
    val actual: Map[Long, Option[Double]] = leftDf.select("lid", "B")
      .conditionalJoin(rightDf.select("Numeric"), Seq(("B", "Numeric", "<")),
        how = "left", keep = "first")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    val numerics = rightDf.select("Numeric").collect()
      .flatMap(r => if (r.isNullAt(0)) None else Some(r.getDouble(0))).sorted
    leftDf.select("lid", "B").collect().foreach { r =>
      val expected = if (r.isNullAt(1)) None
        else numerics.find(_ > r.getDouble(1))
      assert(actual(r.getLong(0)) == expected)
    }
  }

  // ---- dual / multiple conditions ----

  test("dual ge+le numbers (test_dual_conditions_ge_and_le_numbers)") {
    check(Seq(("A", "Integers", ">="), ("A", "Integers", "<=")))
  }
  test("dual gt+lt dates (test_dual_conditions_gt_and_lt_dates)") {
    check(Seq(("E", "Dates", ">"), ("E", "Dates_Right", "<")))
  }
  test("dual gt+lt numbers left join (test_dual_conditions_gt_and_lt_numbers_left_join)") {
    check(Seq(("A", "Integers", ">"), ("B", "Numeric", "<")), how = "left")
  }
  test("dual gt+lt numbers right join (test_dual_conditions_gt_and_lt_numbers_right_join)") {
    check(Seq(("A", "Integers", ">"), ("B", "Numeric", "<")), how = "right")
  }
  test("dual ne (test_dual_ne)") {
    check(Seq(("A", "Integers", "!="), ("B", "Numeric", "!=")))
  }
  test("multiple ne incl dates (test_multiple_ne_dates)") {
    check(Seq(("A", "Integers", "!="), ("B", "Numeric", "!="),
      ("E", "Dates", "!=")))
  }
  test("eq + ne (test_dual_conditions_eq_and_ne)") {
    check(Seq(("A", "Integers", "=="), ("E", "Dates", "!=")))
  }
  test("ne + eq (test_dual_conditions_ne_and_eq)") {
    check(Seq(("A", "Integers", "!="), ("C", "Strings", "==")))
  }
  test("gt + lt + ne (test_gt_lt_ne_conditions)") {
    check(Seq(("A", "Integers", ">"), ("E", "Dates", "<"),
      ("B", "Numeric", "!=")))
  }
  test("eq + ge + le (test_ge_eq_and_le_numbers)") {
    check(Seq(("A", "Integers", ">="), ("E", "Dates", "<="),
      ("C", "Strings", "==")))
  }
  test("force=true gives the same output (test_ge_eq_and_le_numbers_force)") {
    val conds: Seq[JoinOps.Cond] = Seq(("A", "Integers", ">="),
      ("E", "Dates", "<="), ("C", "Strings", "=="))
    val a = leftDf.conditionalJoin(rightDf, conds)
    val b = leftDf.conditionalJoin(rightDf, conds, force = true)
    assert(canon(rowsOf(a)) === canon(rowsOf(b)))
  }
  test("multiple eqs + non-equi (test_multiple_eqs)") {
    check(Seq(("C", "Strings", "=="), ("D", "Booleans", "=="),
      ("A", "Integers", "<")))
  }
  test("multiple eqs outer (test_multiple_eqs_outer)") {
    check(Seq(("C", "Strings", "=="), ("D", "Booleans", "=="),
      ("A", "Integers", "<")), how = "outer")
  }
  test("eq strings + gt number (test_eq_strings)") {
    check(Seq(("C", "Strings", "=="), ("A", "Integers", ">")))
  }
  test("banded keep reduction: randomized parity across seeds (property)") {
    // fresh random fixtures per seed — nulls, DUPLICATE intervals (few
    // distinct (lo, hi) pairs so the representative reduction really
    // engages), inverted/empty intervals — each how×keep combo against
    // the brute enumerator
    for (seed <- Seq(1, 7, 13)) {
      val r = new scala.util.Random(seed)
      val l = (0 until 25).map { i =>
        (i.toLong, if (r.nextInt(6) == 0) None else Some(r.nextInt(40) / 2.0))
      }.toDF("lid", "x")
      val rr = (0 until 20).map { i =>
        val lo = (r.nextInt(8) * 2).toDouble // few distinct -> dup intervals
        (i.toLong,
          if (r.nextInt(7) == 0) None else Some(lo),
          if (r.nextInt(7) == 0) None
          else Some(lo + (r.nextInt(4) - 1) * 3.0)) // sometimes hi < lo
      }.toDF("rid", "lo", "hi")
      for (how <- Seq("inner", "left", "right", "outer");
           keep <- Seq("first", "last")) {
        val conds: Seq[JoinOps.Cond] =
          Seq(("x", "lo", ">="), ("x", "hi", "<="))
        val actual = l.conditionalJoin(rr, conds, how, keep)
        assert(canon(rowsOf(actual)) ===
          canon(expectedRows(l, rr, conds, how, keep)),
          s"seed=$seed how=$how keep=$keep")
      }
    }
  }

  test("two-sided numeric range: banded keep reduction keeps value parity") {
    // this shape (one numeric left column between two distinct numeric
    // right columns) routes the join through rangeJoin's banded machinery
    // and, for keep=first/last, the per-distinct-interval representative
    // reduction — every how × keep combo must match the brute enumerator
    // (fixtures carry null bounds, null payloads, duplicate-ish intervals)
    for (how <- Seq("inner", "left", "right", "outer");
         keep <- Seq("all", "first", "last"))
      check(Seq(("B", "Integers", ">="), ("B", "Numeric", "<=")),
        how = how, keep = keep)
    // indicator riding the reduced path: demoted/unmatched marks intact
    check(Seq(("B", "Integers", ">="), ("B", "Numeric", "<=")),
      how = "outer", keep = "first", indicator = true)
    check(Seq(("B", "Integers", ">"), ("B", "Numeric", "<")),
      how = "right", keep = "last", indicator = true)
  }

  test("multi-condition keep first/last (test_multiple_non_eq_first/last)") {
    check(Seq(("A", "Integers", "<="), ("E", "Dates", "<")), keep = "first")
    check(Seq(("A", "Integers", "<="), ("E", "Dates", "<")), keep = "last")
  }
  test("outer with keep first (keep applies to matches, outer rows survive)") {
    check(Seq(("A", "Integers", "<")), how = "outer", keep = "first")
  }
  test("right join with keep last demotes fully-dropped right rows") {
    check(Seq(("A", "Integers", "<")), how = "right", keep = "last")
    check(Seq(("B", "Numeric", ">")), how = "right", keep = "first")
  }
  test("outer + keep + indicator: demoted rows flip to right_only") {
    check(Seq(("A", "Integers", "<")), how = "outer", keep = "first",
      indicator = true)
  }
  test("indicator across how (test_indicator)") {
    check(Seq(("A", "Integers", "<")), how = "outer", indicator = true)
    check(Seq(("A", "Integers", "<")), how = "left", indicator = true)
  }

  // ---- null-pair golden cases (hand-enumerated, not oracle-derived) ----

  test("!= pairs nulls with everything incl null-vs-null (utils.py:_not_equal_indices)") {
    val l = Seq((1L, Some(1.0)), (2L, None)).toDF("id", "x")
    val r = Seq((10L, Some(1.0)), (20L, None)).toDF("rid", "y")
    val got = l.conditionalJoin(r, Seq(("x", "y", "!=")))
      .select("id", "rid").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    // (1,1.0)!=(10,1.0) is false; every null pairing matches
    assert(got === Set((1L, 20L), (2L, 10L), (2L, 20L)))
  }
  test("== pairs null equi-keys like pandas merge (NaN factorizes as a key)") {
    val l = Seq((1L, Some(1.0)), (2L, None)).toDF("id", "x")
    val r = Seq((10L, Some(1.0)), (20L, None)).toDF("rid", "y")
    val got = l.conditionalJoin(r, Seq(("x", "y", "=="), ("id", "rid", "<")))
      .select("id", "rid").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(got === Set((1L, 10L), (2L, 20L)))
  }
  test("range ops never match nulls (pandas comparison semantics)") {
    val l = Seq((1L, Some(1.0)), (2L, None)).toDF("id", "x")
    val r = Seq((10L, Some(5.0)), (20L, None)).toDF("rid", "y")
    val got = l.conditionalJoin(r, Seq(("x", "y", "<")))
      .select("id", "rid").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(got === Set((1L, 10L)))
  }

  // ---- docstring example (test_conditional_join :38) ----

  test("docstring example: value_1 strictly inside (value_2A, value_2B)") {
    val df1 = Seq(2, 5, 7, 1, 3, 4).toDF("value_1")
    val df2 = Seq((0, 1), (3, 5), (7, 9), (12, 15), (0, 1), (2, 4), (3, 6), (1, 3))
      .toDF("value_2A", "value_2B")
    val got = df1.conditionalJoin(df2,
      Seq(("value_1", "value_2A", ">"), ("value_1", "value_2B", "<")))
    assert(canon(rowsOf(got)) === canon(expectedRows(df1, df2,
      Seq(("value_1", "value_2A", ">"), ("value_1", "value_2B", "<")))))
    assert(got.count() > 0)
  }

  // ---- df_columns / right_columns (conditional_join.py:1186-1196) ----

  test("right_columns=Nil keeps only the left side (test_..._df_columns_only)") {
    val got = leftDf.conditionalJoin(rightDf,
      Seq(("E", "Dates", "<"), ("A", "Integers", ">=")),
      rightColumns = Nil)
    assert(got.columns.toSeq === leftDf.columns.toSeq)
    val exp = expectedRows(leftDf, rightDf,
      Seq(("E", "Dates", "<"), ("A", "Integers", ">=")))
      .map(_.take(leftDf.columns.length))
    assert(canon(rowsOf(got)) === canon(exp))
  }
  test("df_columns=Nil keeps only the right side (test_..._right_only)") {
    val got = leftDf.conditionalJoin(rightDf,
      Seq(("E", "Dates", "<"), ("A", "Integers", ">=")),
      dfColumns = Nil)
    assert(got.columns.toSeq === rightDf.columns.toSeq)
    val exp = expectedRows(leftDf, rightDf,
      Seq(("E", "Dates", "<"), ("A", "Integers", ">=")))
      .map(_.drop(leftDf.columns.length))
    assert(canon(rowsOf(got)) === canon(exp))
  }
  test("column selection lists restrict and order the output") {
    val got = leftDf.conditionalJoin(rightDf, Seq(("A", "Integers", ">=")),
      dfColumns = Seq("A", "E"), rightColumns = Seq("Dates", "Integers"))
    assert(got.columns.toSeq === Seq("A", "E", "Dates", "Integers"))
  }
  test("overlapping names: right gets right_ prefix; dropping the left copy un-prefixes") {
    val l = Seq((1L, 2L)).toDF("A", "B")
    val r = Seq((0L, 9L)).toDF("A", "C")
    val both = l.conditionalJoin(r, Seq(("A", "A", ">")))
    assert(both.columns.toSeq === Seq("A", "B", "right_A", "C"))
    val dropLeft = l.conditionalJoin(r, Seq(("A", "A", ">")),
      dfColumns = Seq("B"))
    assert(dropLeft.columns.toSeq === Seq("B", "A", "C"))
  }

  // ---- error contracts ----

  test("error contracts match the reference") {
    val l = Seq((1L, "a")).toDF("A", "S")
    val r = Seq((2L, "b")).toDF("B", "T")
    // no conditions / equality only
    intercept[IllegalArgumentException](JoinOps.conditionalJoin(l, r, Nil))
    intercept[IllegalArgumentException](
      l.conditionalJoin(r, Seq(("A", "B", "=="))))
    // bad op / how / keep
    intercept[IllegalArgumentException](
      l.conditionalJoin(r, Seq(("A", "B", "~"))))
    intercept[IllegalArgumentException](
      l.conditionalJoin(r, Seq(("A", "B", "<")), how = "sideways"))
    intercept[IllegalArgumentException](
      l.conditionalJoin(r, Seq(("A", "B", "<")), keep = "blah"))
    // missing columns raise eagerly
    intercept[IllegalArgumentException](
      l.conditionalJoin(r, Seq(("nope", "B", "<"))))
    intercept[IllegalArgumentException](
      l.conditionalJoin(r, Seq(("A", "nope", "<"))))
    // strings in a non-equi condition (test_dtype_strings_non_equi)
    intercept[IllegalArgumentException](
      l.conditionalJoin(r, Seq(("S", "T", "<"))))
    // cross-family non-equi (numeric vs datetime)
    val rd = Seq(java.sql.Timestamp.valueOf("2020-01-01 00:00:00")).toDF("D")
    intercept[IllegalArgumentException](
      l.conditionalJoin(rd, Seq(("A", "D", "<"))))
    // indicator name collision (test_indicator_exists)
    intercept[IllegalArgumentException](
      l.conditionalJoin(r, Seq(("A", "B", "<")),
        indicator = true, indicatorName = "S"))
    // both sides dropped (conditional_join.py:1186)
    intercept[IllegalArgumentException](
      l.conditionalJoin(r, Seq(("A", "B", "<")),
        dfColumns = Nil, rightColumns = Nil))
    // custom indicator name lands as the last column
    val ind = l.conditionalJoin(r, Seq(("A", "B", "<")),
      indicator = true, indicatorName = "source")
    assert(ind.columns.last === "source")
  }

  test("get_join_indices allows equality-only conditions (test_eq_indices)") {
    val l = Seq((1L, 1.0), (2L, 2.0), (3L, 2.0)).toDF("lid", "x")
    val r = Seq((10L, 2.0), (20L, 3.0)).toDF("rid", "y")
    val got = JoinOps.getJoinIndices(l, r, Seq("lid"), Seq("rid"),
      Seq(("x", "y", "==")))
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(got === Set((2L, 10L), (3L, 10L)))
    // keep passes through (conditional_join.py:1457 keep param)
    val first = JoinOps.getJoinIndices(l, r, Seq("lid"), Seq("rid"),
      Seq(("x", "y", "<=")), keep = "first")
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(first === Set((1L, 10L), (2L, 10L), (3L, 10L)))
    // the public verb still rejects equality-only sets
    intercept[IllegalArgumentException](
      l.conditionalJoin(r, Seq(("x", "y", "=="))))
  }

  // ---- empty / no-match shapes (test_left_empty/right_empty/no_match) ----

  test("empty and no-match inputs (test_left_empty/right_empty/no_match)") {
    val l = Seq((1L, 1.0), (2L, 2.0)).toDF("id", "x")
    val r = Seq((10L, 9.0)).toDF("rid", "y")
    val emptyL = l.limit(0)
    assert(emptyL.conditionalJoin(r, Seq(("x", "y", ">"))).count() === 0)
    assert(l.conditionalJoin(r.limit(0), Seq(("x", "y", ">"))).count() === 0)
    assert(l.conditionalJoin(r, Seq(("x", "y", ">"))).count() === 0) // no match
    // left join with no match: every left row once, right side null
    val lj = l.conditionalJoin(r, Seq(("x", "y", ">")), how = "left")
    assert(lj.count() === 2 && lj.filter(col("y").isNull).count() === 2)
    // keep on an empty match set must not fail
    assert(l.conditionalJoin(r, Seq(("x", "y", ">")), how = "left",
      keep = "first").count() === 2)
  }
}
