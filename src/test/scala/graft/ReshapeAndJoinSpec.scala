package graft

import graft.syntax._
import graft.operators.{JoinOps, ReshapeOps}
import org.apache.spark.sql.functions._

class ReshapeAndJoinSpec extends SparkSpec {
  import spark.implicits._

  test("pivotLonger dropna and namesTransform") {
    val d = Seq((1, Some(2.0), Option.empty[Double])).toDF("id", "x_1", "x_2")
    val out = d.pivotLonger(index = Seq("id"), namesTo = Seq("var", "year"),
      namesSep = Some("_"), dropna = true, namesTransform = Map("year" -> "int"))
    assert(out.columns.toSeq == Seq("id", "var", "year", "value"))
    val rows = out.collect()
    assert(rows.length == 1 && rows(0).getInt(2) == 1 && rows(0).getDouble(3) == 2.0)
  }

  test("pivotLonger .value groups fill missing targets with null") {
    val d = Seq((1, 10.0, 20.0, 30.0)).toDF("id", "qty_a", "qty_b", "price_a")
    val out = d.pivotLonger(index = Seq("id"), namesTo = Seq(".value", "grp"),
      namesSep = Some("_"))
    val byGrp = out.collect().map(r => r.getString(1) ->
      (Option(r.get(2)), Option(r.get(3)))).toMap
    // columns sorted: price, qty
    assert(byGrp("a") == (Some(30.0), Some(10.0)))
    assert(byGrp("b") == (None, Some(20.0)))
  }

  test("pivotLonger with names_pattern regex groups") {
    val d = Seq((1, 5.0)).toDF("id", "metric2024")
    val out = d.pivotLonger(index = Seq("id"), namesTo = Seq("what", "year"),
      namesPattern = Some("([a-z]+)(\\d+)"))
    val r = out.collect()(0)
    assert(r.getString(1) == "metric" && r.getString(2) == "2024" && r.getDouble(3) == 5.0)
  }

  test("pivotLongerValuesTo: the reference Fruit/Drink doctest, ragged groups null-fill") {
    // pivot.py doctest "Multiple values_to" — golden output ported
    val d = Seq(("Houston", "Texas", 4, 10, 40, 16, 20),
      ("Austin", "Texas", 10, 8, 99, 200, 33),
      ("Hoover", "Alabama", 90, 14, 43, 34, 18))
      .toDF("City", "State", "Mango", "Orange", "Watermelon", "Gin", "Vodka")
    val out = d.pivotLongerValuesTo(index = Seq("City", "State"),
      namesTo = Seq("Fruit", "Drink"), valuesTo = Seq("Pounds", "Ounces"),
      namesPatterns = Seq("M|O|W", "G|V"))
    assert(out.columns.toSeq == Seq("City", "State", "Fruit", "Drink", "Pounds", "Ounces"))
    val got = out.collect().map(r => (r.getString(0), r.getString(2),
      Option(r.get(3)), r.getInt(4), Option(r.get(5)))).toSet
    assert(got == Set(
      ("Houston", "Mango", Some("Gin"), 4, Some(16)),
      ("Austin", "Mango", Some("Gin"), 10, Some(200)),
      ("Hoover", "Mango", Some("Gin"), 90, Some(34)),
      ("Houston", "Orange", Some("Vodka"), 10, Some(20)),
      ("Austin", "Orange", Some("Vodka"), 8, Some(33)),
      ("Hoover", "Orange", Some("Vodka"), 14, Some(18)),
      ("Houston", "Watermelon", None, 40, None),
      ("Austin", "Watermelon", None, 99, None),
      ("Hoover", "Watermelon", None, 43, None)))
  }

  test("pivotLongerDict and pivotLongerNestedDict: the reference year/hr doctests") {
    val d = Seq((514, 545, "Red Sox", 2007, 2008), (573, 526, "Yankees", 2007, 2008))
      .toDF("hr1", "hr2", "team", "year1", "year2")
    val flat = d.pivotLongerDict(index = Seq("team"),
      pattern = Seq("year" -> "year", "hr" -> "hr"))
    assert(flat.columns.toSeq == Seq("team", "year", "hr"))
    val got = flat.collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2))).toSet
    assert(got == Set(("Red Sox", 2007, 514), ("Yankees", 2007, 573),
      ("Red Sox", 2008, 545), ("Yankees", 2008, 526)))
    // nested dict == values_to form
    val nested = d.pivotLongerNestedDict(index = Seq("team"),
      pattern = Seq(("year_name", "year", "year"), ("hr_name", "hr", "hr")))
    assert(nested.columns.toSeq == Seq("team", "year_name", "hr_name", "year", "hr"))
    val n0 = nested.filter(col("team") === "Red Sox" && col("year_name") === "year1").collect()(0)
    assert(n0.getInt(3) == 2007 && n0.getString(2) == "hr1" && n0.getInt(4) == 514)
  }

  test("pivotLongerNamedGroups: underscore groups are .value placeholders") {
    val d = Seq((10, 20, 30, 40, 50)).toDF("x_1_mean", "x_2_mean", "y_1_mean", "y_2_mean", "unit")
    val out = d.pivotLongerNamedGroups(index = Seq("unit"),
      namesPattern = "(?P<_>x|y)_(?P<time>[0-9])(?P<__>_mean)")
    // doctest: unit time x_mean y_mean — targets sorted alphabetically
    val got = out.collect().map(r => (r.getString(1), r.getInt(2), r.getInt(3))).toSet
    assert(out.columns.toSeq == Seq("unit", "time", "x_mean", "y_mean"))
    assert(got == Set(("1", 10, 30), ("2", 20, 40)))
  }

  test("pivotLongerMulti raises when a regex claims no column") {
    val d = Seq((1, 2)).toDF("a1", "b1")
    intercept[IllegalArgumentException] {
      d.pivotLongerMulti(Seq("a1"), Seq("x", "y"), Seq("^b", "^zzz"))
    }
  }

  test("pivotWider namesPrefix and unseen known values") {
    val d = Seq((1, "x", 2.0)).toDF("id", "k", "v")
    val out = d.pivotWider(Seq("id"), "k", "v", agg = "sum",
      namesPrefix = "k_", knownValues = Seq("x", "y"))
    assert(out.columns.toSeq == Seq("id", "k_x", "k_y"))
    assert(out.collect()(0).isNullAt(2))
  }

  test("pivotWider namesGlue templates labels like the reference doctest") {
    // pivot.py doctest: names_glue = "{_value}_step{step}" -> a_step1 ...
    val d = Seq((5.5, 1, 20), (5.5, 2, 25), (6.1, 1, 22), (6.1, 2, 18))
      .toDF("dep", "step", "a")
    val out = d.pivotWider(Seq("dep"), namesFrom = "step", valuesFrom = "a",
      namesGlue = "{_value}_step{step}")
    assert(out.columns.toSeq == Seq("dep", "a_step1", "a_step2"))
    val r = out.filter(col("dep") === 5.5).collect()(0)
    assert(r.getInt(1) == 20 && r.getInt(2) == 25)
  }

  test("pivotWider namesExpand reads the category registry; unseen categories become null columns") {
    val weekdays = Seq("Mon", "Tue", "Wed", "Thu", "Fri", "Sat", "Sun")
    val d = Seq(("Tue", 2), ("Thu", 3), ("Fri", 1), ("Mon", 5)).toDF("day", "value")
      .withColumn("id", lit(0))
    val cat = graft.operators.TypeOps.encodeCategorical(d, "day", weekdays)
    val out = cat.pivotWider(Seq("id"), namesFrom = "day", valuesFrom = "value",
      namesExpand = true)
    assert(out.columns.toSeq == "id" +: weekdays)
    val r = out.collect()(0)
    assert(r.getInt(1) == 5 && r.isNullAt(3) && r.isNullAt(6) && r.isNullAt(7))
    // without a registry, names_expand raises
    intercept[IllegalArgumentException] {
      d.pivotWider(Seq("id"), "day", "value", namesExpand = true)
    }
  }

  test("complete explicitOnlyNew leaves existing nulls alone") {
    val d = Seq(("a", 1, Option.empty[Double]), ("b", 2, Some(5.0)))
      .toDF("k1", "k2", "v")
    val out = ReshapeOps.complete(d, Seq("k1", "k2"),
      fillValue = Map("v" -> 0.0), explicitOnlyNew = true)
    val got = out.collect().map(r => (r.getString(0), r.getInt(1),
      if (r.isNullAt(2)) null else r.getDouble(2))).toSet
    assert(got == Set(("a", 1, null), ("a", 2, 0.0), ("b", 1, 0.0), ("b", 2, 5.0)))
  }

  test("completeNested: the reference 'multiple groupings' case, verbatim") {
    // tests/functions/test_complete.py:407-436 (tidyr nesting semantics):
    // observed (meta, domain1) pairs crossed with observed
    // (project_id, question_count) pairs; tag_count fills with 0
    val df3 = Seq(
      (1, "A", "d", 3, 2), (1, "A", "e", 3, 1), (1, "B", "h", 3, 3),
      (1, "B", "i", 3, 2), (2, "A", "d", 2, 1), (2, "B", "i", 2, 1),
      (2, "C", "k", 2, 2))
      .toDF("project_id", "meta", "domain1", "question_count", "tag_count")
    val out = ReshapeOps.completeNested(df3,
      Seq(Seq("meta", "domain1"), Seq("project_id", "question_count")),
      fillValue = Map("tag_count" -> 0))
      .select("project_id", "meta", "domain1", "question_count", "tag_count")
    val expected = Set(
      (1, "A", "d", 3, 2), (2, "A", "d", 2, 1), (1, "A", "e", 3, 1),
      (2, "A", "e", 2, 0), (1, "B", "h", 3, 3), (2, "B", "h", 2, 0),
      (1, "B", "i", 3, 2), (2, "B", "i", 2, 1), (1, "C", "k", 3, 0),
      (2, "C", "k", 2, 2))
    val got = out.collect().map(r => (r.getInt(0), r.getString(1),
      r.getString(2), r.getInt(3), r.getInt(4))).toSet
    assert(got == expected)
    // flat complete is the all-singleton special case: 3 metas x 5 domains
    // x 2 projects x 2 counts = 60 rows (vs nesting's 10)
    assert(ReshapeOps.complete(df3,
      Seq("meta", "domain1", "project_id", "question_count")).count() == 60)
    // a column in two groups raises clearly (reference duplicate-spec error)
    intercept[IllegalArgumentException](ReshapeOps.completeNested(df3,
      Seq(Seq("meta", "domain1"), Seq("meta"))))
  }

  test("caseWhen: the reference first-match-wins doctest (string-typed)") {
    // tests/functions/test_case_when.py:13-39 with the object columns held
    // as strings (Spark columns are uniformly typed)
    val d = Seq(("0", "0", "6"), ("0", "3", "7"), ("1", "4", "8"),
      ("2", "5", "9"), ("hi", "bye", "wait"))
      .toDF("a", "b", "c")
    val out = graft.operators.TransformOps.caseWhen(d, "value",
      Seq(
        ((col("a") === "0" && col("b") =!= "0") || col("c") === "wait", col("a")),
        (col("b") === "0" && col("a") === "0", lit("x"))),
      default = col("c"))
    assert(out.select("value").collect().map(_.getString(0)).toSeq ==
      Seq("x", "0", "8", "9", "hi"))
  }

  test("pivot roundtrips: long->wide->long and wide->long->wide (reference cases)") {
    // tests/functions/test_pivot_wider.py:182-246
    val dfIn = Seq((1, 2, "ben", 22, 5, 13), (1, 2, "dave", 23, 4, 11))
      .toDF("a", "b", "name", "points", "marks", "sets")
    val wide = ReshapeOps.pivotWiderMulti(dfIn, index = Seq("a", "b"),
      namesFrom = "name", valuesFrom = Seq("points", "marks", "sets"))
    assert(wide.columns.toSet == Set("a", "b",
      "points_ben", "points_dave", "marks_ben", "marks_dave", "sets_ben", "sets_dave"))
    val backToLong = wide.pivotLonger(index = Seq("a", "b"),
      namesTo = Seq(".value", "name"), namesSep = Some("_"))
      .select("a", "b", "name", "points", "marks", "sets")
    assert(sorted(backToLong) == sorted(dfIn))

    val df2 = Seq(("Wilbur", 67, 56), ("Petunia", 80, 90), ("Gregory", 64, 50))
      .toDF("name", "a", "b")
    val long2 = df2.pivotLonger(index = Seq("name"), namesTo = Seq("drug"),
      valuesTo = "heartrate")
    val wide2 = ReshapeOps.pivotWider(long2, index = Seq("name"),
      namesFrom = "drug", valuesFrom = "heartrate")
      .select("name", "a", "b")
    assert(sorted(wide2) == sorted(df2))
  }

  test("expandGrid builds typed cartesian products") {
    val out = ReshapeOps.expandGrid(spark, Seq("i" -> Seq(1, 2), "s" -> Seq("a")))
    assert(out.count() == 2 && out.columns.toSeq == Seq("i", "s"))
  }

  test("conditionalJoin rejects equality-only and supports !=") {
    val l = Seq((1, 2)).toDF("a", "x")
    val r = Seq((1, 3)).toDF("b", "y")
    intercept[IllegalArgumentException](
      JoinOps.conditionalJoin(l, r, Seq(("a", "b", "=="))))
    assert(JoinOps.conditionalJoin(l, r, Seq(("a", "b", "!="))).count() == 0)
    assert(JoinOps.conditionalJoin(l, r, Seq(("x", "y", "<"))).count() == 1)
  }

  test("conditionalJoin left join and indicator") {
    val l = Seq((1, 10), (2, 99)).toDF("id", "x")
    val r = Seq((5, 20)).toDF("lo", "hi")
    val out = JoinOps.conditionalJoin(l, r,
      Seq(("x", "lo", ">="), ("x", "hi", "<=")), how = "left", indicator = true)
    val byId = out.collect().map(row => row.getInt(0) -> row.getString(4)).toMap
    assert(byId == Map(1 -> "both", 2 -> "left_only"))
  }

  test("conditionalJoin right and outer joins preserve unmatched sides") {
    val l = Seq((1, 10)).toDF("id", "x")
    val r = Seq((5, 20), (50, 60)).toDF("lo", "hi")
    val right = JoinOps.conditionalJoin(l, r,
      Seq(("x", "lo", ">="), ("x", "hi", "<=")), how = "right")
    assert(right.count() == 2 && right.filter(col("id").isNull).count() == 1)
    val outer = JoinOps.conditionalJoin(l, r,
      Seq(("x", "lo", ">="), ("x", "hi", "<=")), how = "outer", indicator = true)
    val merges = outer.collect().map(_.getString(4)).sorted.toSeq
    assert(merges == Seq("both", "right_only"))
  }

  test("conditionalJoin keep=last picks highest right ordering") {
    val l = Seq((1, 10)).toDF("id", "x")
    val r = Seq((1, 1), (2, 5), (3, 8)).toDF("rid", "lo")
    val out = JoinOps.conditionalJoin(l, r, Seq(("x", "lo", ">")), keep = "last")
    assert(out.collect()(0).getInt(2) == 3) // rid of lo=8
  }

  test("conditionalJoin prefixes colliding right columns") {
    val l = Seq((1, 5)).toDF("id", "v")
    val r = Seq((1, 3)).toDF("id", "w")
    val out = JoinOps.conditionalJoin(l, r, Seq(("v", "w", ">")))
    assert(out.columns.toSeq == Seq("id", "v", "right_id", "w"))
  }

  test("rangeJoin matches the naive theta join") {
    val l = (1 to 40).map(i => (i, i.toDouble)).toDF("id", "x")
    val r = Seq((1, 3.0, 9.0), (2, 8.0, 12.0), (3, 30.0, 31.0)).toDF("rid", "lo", "hi")
    val banded = JoinOps.rangeJoin(l, r, "x", "lo", "hi", bandWidth = 4.0)
    val naive = l.join(r, col("x") >= col("lo") && col("x") <= col("hi"))
    assert(sorted(banded.select("id", "rid")) == sorted(naive.select("id", "rid")))
  }

  test("rangeJoin routes over-wide intervals through the capped branch losslessly") {
    val l = (1 to 60).map(i => (i, i.toDouble)).toDF("id", "x")
    // interval 2 spans 50 bands at W=1 — far over maxBands=4
    val r = Seq((1, 3.0, 5.0), (2, 1.0, 51.0), (3, 58.0, 59.0)).toDF("rid", "lo", "hi")
    val capped = JoinOps.rangeJoin(l, r, "x", "lo", "hi", bandWidth = 1.0, maxBands = 4)
    val naive = l.join(r, col("x") >= col("lo") && col("x") <= col("hi"))
    assert(sorted(capped.select("id", "rid")) == sorted(naive.select("id", "rid")))
  }

  test("rangeJoin derives band width from data when not given") {
    val l = (1 to 40).map(i => (i, i.toDouble)).toDF("id", "x")
    val r = Seq((1, 3.0, 9.0), (2, 8.0, 12.0), (3, 30.0, 31.0)).toDF("rid", "lo", "hi")
    val auto = JoinOps.rangeJoin(l, r, "x", "lo", "hi")
    val naive = l.join(r, col("x") >= col("lo") && col("x") <= col("hi"))
    assert(sorted(auto.select("id", "rid")) == sorted(naive.select("id", "rid")))
  }

  test("rangeJoin distinct-interval compression matches the naive theta join") {
    val l = (1 to 80).map(i => (i, (i % 40).toDouble)).toDF("id", "x")
    // 30 right rows but only 3 distinct (lo, hi) — auto probe fires (d/n = 0.1)
    val r = (1 to 30).map(j => (j, (j % 3) * 10.0, (j % 3) * 10.0 + 6.0))
      .toDF("rid", "lo", "hi")
    val naive = sorted(l.join(r, col("x") >= col("lo") && col("x") <= col("hi"))
      .select("id", "rid"))
    for (mode <- Seq("auto", "on", "off")) {
      val got = JoinOps.rangeJoin(l, r, "x", "lo", "hi", bandWidth = 4.0,
        dedupIntervals = mode)
      assert(sorted(got.select("id", "rid")) == naive, s"mode=$mode")
      // column order is stable across paths: left columns then right columns
      assert(got.columns.toSeq == Seq("id", "x", "rid", "lo", "hi"), s"mode=$mode")
    }
  }

  test("rangeJoin compression handles outer forms, null bounds and over-wide intervals") {
    val l = Seq((1, 5.0), (2, 99.0), (3, 11.0)).toDF("id", "x")
    // duplicated intervals + a null-bounded row + an over-wide interval
    def jd(x: Double): java.lang.Double = java.lang.Double.valueOf(x)
    val r = Seq[(Int, java.lang.Double, java.lang.Double)](
        (1, jd(3.0), jd(9.0)), (2, jd(3.0), jd(9.0)), (3, jd(3.0), jd(9.0)),
        (4, jd(3.0), jd(9.0)), (5, null, jd(9.0)), (6, jd(0.0), jd(50.0)))
      .toDF("rid", "lo", "hi")
    val naive = l.join(r, col("x") >= col("lo") && col("x") <= col("hi"), "full_outer")
    val got = JoinOps.rangeJoin(l, r, "x", "lo", "hi", bandWidth = 2.0,
      how = "outer", maxBands = 8, dedupIntervals = "on")
    assert(sorted(got.select("id", "rid")) == sorted(naive.select("id", "rid")))
  }

  test("rangeJoin outer forms keep unmatched rows from both sides") {
    val l = Seq((1, 5.0), (2, 99.0)).toDF("id", "x")
    val r = Seq((1, 3.0, 9.0), (2, 40.0, 41.0)).toDF("rid", "lo", "hi")
    def got(how: String) = JoinOps.rangeJoin(l, r, "x", "lo", "hi",
        bandWidth = 2.0, how = how)
      .select("id", "rid").collect()
      .map(row => (if (row.isNullAt(0)) -1 else row.getInt(0),
        if (row.isNullAt(1)) -1 else row.getInt(1))).sorted.toSeq
    assert(got("left") == Seq((1, 1), (2, -1)))
    assert(got("right") == Seq((-1, 2), (1, 1)))
    assert(got("outer") == Seq((-1, 2), (1, 1), (2, -1)))
  }

  test("rangeJoin how=outer round-trips under AQE: union of matches and complements is lossless") {
    // AQE is on session-wide (SparkSpec); enough rows that the id-tagged
    // frames span several partitions, exercising the localCheckpoint pin
    val l = (1 to 500).map(i => (i, (i % 97).toDouble)).toDF("id", "x")
      .repartition(7)
    val r = (1 to 60).map(j => (j, j * 1.5, j * 1.5 + 2.0)).toDF("rid", "lo", "hi")
      .repartition(5)
    val outer = JoinOps.rangeJoin(l, r, "x", "lo", "hi", bandWidth = 2.0, how = "outer")
    val naive = l.join(r, col("x") >= col("lo") && col("x") <= col("hi"), "full_outer")
    assert(sorted(outer.select("id", "rid")) == sorted(naive.select("id", "rid")))
    // every left id appears, every right id appears (no dropped complements)
    assert(outer.select("id").na.drop().distinct().count() == 500)
    assert(outer.select("rid").na.drop().distinct().count() == 60)
  }

  test("conditionalJoin keep=first with how=right/full keeps every unmatched right row") {
    val l = Seq((1, 10)).toDF("id", "x")
    // two matching right rows (keep=first picks lo=1) + two unmatched rows
    val r = Seq((1, 1), (2, 5), (3, 50), (4, 60)).toDF("rid", "lo")
    val right = JoinOps.conditionalJoin(l, r, Seq(("x", "lo", ">")),
      how = "right", keep = "first")
    val gotRight = right.select("id", "rid").collect()
      .map(row => (if (row.isNullAt(0)) -1 else row.getInt(0), row.getInt(1))).sorted.toSeq
    // rid=2's only match loses the keep race → DEMOTED to right_only, not
    // dropped (conditional_join.py:1333 recomputes the right indexer from
    // the post-keep indices) — fixed by the round-17 fidelity sweep
    assert(gotRight == Seq((-1, 2), (-1, 3), (-1, 4), (1, 1)))
    val full = JoinOps.conditionalJoin(l, r, Seq(("x", "lo", ">")),
      how = "outer", keep = "last")
    val gotFull = full.select("id", "rid").collect()
      .map(row => (if (row.isNullAt(0)) -1 else row.getInt(0), row.getInt(1))).sorted.toSeq
    assert(gotFull == Seq((-1, 1), (-1, 3), (-1, 4), (1, 2)))
  }

  test("fuzzySelfJoin finds exactly the pairs within edit distance (all edit kinds)") {
    import graft.operators.JoinOps
    val d = Seq(
      (1L, "kitten"), (2L, "sitten"),  // substitution, dist 1
      (3L, "kittn"),                   // deletion vs kitten, dist 1
      (4L, "kittens"),                 // insertion vs kitten, dist 1
      (5L, "sitting"),                 // dist 2 from sitten -> excluded at k=1
      (6L, "zebra")).toDF("id", "s")
    val got = JoinOps.fuzzySelfJoin(d, "id", "s", maxDist = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted
    // exact expectation computed against a reference levenshtein
    def lev(a: String, b: String): Int = {
      val m = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        m(i)(j) = math.min(math.min(m(i - 1)(j) + 1, m(i)(j - 1) + 1),
          m(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      m(a.length)(b.length)
    }
    val rows = d.collect().map(r => (r.getLong(0), r.getString(1)))
    val expected = (for {
      (i1, s1) <- rows; (i2, s2) <- rows if i1 < i2
      dd = lev(s1, s2) if dd <= 1
    } yield (i1, i2, dd)).sorted.toSeq
    assert(got.toSeq == expected)
  }

  test("fuzzySelfJoin maxDist=2 matches brute force on a digit-id corpus") {
    import graft.operators.JoinOps
    def lev(a: String, b: String): Int = {
      val m = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        m(i)(j) = math.min(math.min(m(i - 1)(j) + 1, m(i)(j - 1) + 1),
          m(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      m(a.length)(b.length)
    }
    val strs = (0 until 40).map(i => (i.toLong, f"Cust#${i % 20}%03d${i / 20}%d"))
    val d = strs.toDF("id", "s")
    val got = JoinOps.fuzzySelfJoin(d, "id", "s", maxDist = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted.toSeq
    val expected = (for {
      (i1, s1) <- strs; (i2, s2) <- strs if i1 < i2
      dd = lev(s1, s2) if dd <= 2
    } yield (i1, i2, dd)).sorted
    assert(got == expected)
  }

  test("fuzzySelfJoin maxBucket cap: exact-equal pairs always survive; capped dist-1 documented") {
    import graft.operators.JoinOps
    // a 10-member identical-string clique makes EVERY one of its variant
    // buckets hold 10+ ids; with maxBucket=4 all those buckets are capped,
    // yet all 45 clique pairs must come back through the equal rescue
    val clique = (0L until 10L).map(i => (i, "samevalue"))
    // a dist-1 substitution pair whose single shared variant bucket ("xa"
    // minus the differing char) is NOT hot — must also survive
    val coldPair = Seq((100L, "xaq"), (101L, "xbq"))
    val d = (clique ++ coldPair).toDF("id", "s")
    val got = JoinOps.fuzzySelfJoin(d, "id", "s", maxDist = 1, maxBucket = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted.toSeq
    val cliquePairs = (for { a <- 0L until 10L; b <- (a + 1) until 10L }
      yield (a, b, 0)).toSeq
    assert(got == (cliquePairs :+ ((100L, 101L, 1))).sorted)
    // the documented recall trade: pairs at dist 1 from the clique value
    // share only capped buckets, so they are missed under the cap...
    val withNear = (clique ++ Seq((200L, "samevaluX"))).toDF("id", "s")
    val capped = JoinOps.fuzzySelfJoin(withNear, "id", "s", maxDist = 1, maxBucket = 4)
      .filter(col("id2") === 200L).count()
    assert(capped == 0L)
    // ...and found again once the cap clears the bucket
    val uncapped = JoinOps.fuzzySelfJoin(withNear, "id", "s", maxDist = 1, maxBucket = 100)
      .filter(col("id2") === 200L).count()
    assert(uncapped == 10L)
  }

  test("fuzzyJoin two-table form suffixes collisions and is complete") {
    import graft.operators.JoinOps
    val l = Seq((1L, "alpha"), (2L, "beta")).toDF("id", "name")
    val r = Seq((10L, "alpah"), (11L, "betas"), (12L, "gamma")).toDF("id", "name")
    val got = JoinOps.fuzzyJoin(l, r, "name", "name", maxDist = 2)
      .select("id", "id_r", "dist")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getInt(2))).sorted.toSeq
    assert(got.contains((1L, 10L, 2)) && got.contains((2L, 11L, 1)))
    assert(!got.exists(_._2 == 12L))
  }
}
