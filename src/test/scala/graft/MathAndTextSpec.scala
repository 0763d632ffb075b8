package graft

import graft.functions.{MathFunctions, expressions => gx}
import graft.operators.TextOps
import graft.syntax._
import org.apache.spark.sql.functions._

class MathAndTextSpec extends SparkSpec {
  import spark.implicits._

  test("normCdf/normPpf match published values") {
    assert(math.abs(gx.normCdf(0.0) - 0.5) < 1e-7)
    assert(math.abs(gx.normCdf(1.96) - 0.9750021) < 1e-6)
    assert(math.abs(gx.normCdf(-1.0) - 0.1586553) < 1e-6)
    assert(math.abs(gx.normPpf(0.975) - 1.959964) < 1e-6)
    assert(math.abs(gx.normPpf(0.5)) < 1e-9)
    assert(gx.normPpf(0.0).isNegInfinity && gx.normPpf(1.0).isPosInfinity)
    // round-trip
    Seq(0.01, 0.3, 0.5, 0.77, 0.999).foreach { p =>
      assert(math.abs(gx.normCdf(gx.normPpf(p)) - p) < 1e-5)
    }
  }

  test("normal_cdf / probit work as Column expressions with codegen") {
    val d = Seq(0.0, 1.96).toDF("z")
    val out = d.select(gx.normal_cdf(col("z"))).collect().map(_.getDouble(0))
    assert(math.abs(out(0) - 0.5) < 1e-7 && math.abs(out(1) - 0.975002) < 1e-5)
  }

  test("addColumnIterable cycles with fillRemaining, raises on length mismatch") {
    val d = Seq((1, "p"), (2, "q"), (3, "r"), (4, "s"), (5, "t"))
      .toDF("ord", "x")
    val cycled = d.addColumnIterable("tag", Seq("a", "b"), "ord", fillRemaining = true)
      .collect().map(r => r.getInt(0) -> r.getString(2)).toMap
    assert(cycled == Map(1 -> "a", 2 -> "b", 3 -> "a", 4 -> "b", 5 -> "a"))
    val exact = d.addColumnIterable("tag", Seq("a", "b", "c", "d", "e"), "ord")
      .collect().map(r => r.getInt(0) -> r.getString(2)).toMap
    assert(exact(5) == "e")
    assertThrows[IllegalArgumentException] {
      d.addColumnIterable("tag", Seq("a", "b"), "ord")
    }
  }

  test("add_column raises on existing labels and oversize iterables (test_add_column)") {
    val d = Seq((1, "p"), (2, "q")).toDF("ord", "x")
    // test_add_column_already_exists: adding an existing label raises
    val err = intercept[IllegalArgumentException](d.addColumn("x", lit(1)))
    assert(err.getMessage.contains("already exists"))
    intercept[IllegalArgumentException](
      d.addColumnIterable("x", Seq("a", "b"), "ord"))
    // add_columns loops add_column, so the raise propagates (plural form)
    intercept[IllegalArgumentException](
      d.addColumns(Map("y" -> lit(2), "x" -> lit(3))))
    // test_add_column_too_many: a LONGER list raises even with fill_remaining
    intercept[IllegalArgumentException](
      d.addColumnIterable("tag", Seq("a", "b", "c"), "ord", fillRemaining = true))
    // the happy plural path still appends in order
    assert(d.addColumns(Map("y" -> lit(2))).columns.toSeq == Seq("ord", "x", "y"))
  }

  test("jitter raises eagerly on a non-numeric column (test_datatypes_check)") {
    val d = Seq((1, "city")).toDF("a", "cities")
    intercept[IllegalArgumentException](d.jitter("cities", "out", 1.0))
    intercept[IllegalArgumentException](d.jitter("a", "out", -5.0))
    intercept[IllegalArgumentException](d.jitter("a", "out", 1.0, Some((10.0, 5.0))))
  }

  test("sigmoid/logit inverse relationship") {
    val d = Seq(0.2, 0.5, 0.9).toDF("p")
    val out = d.select(MathFunctions.sigmoid(MathFunctions.logit(col("p"))).as("r"))
      .collect().map(_.getDouble(0))
    out.zip(Seq(0.2, 0.5, 0.9)).foreach { case (a, b) => assert(math.abs(a - b) < 1e-12) }
  }

  test("softmax sums to one; zScore standardizes") {
    val d = Seq(1.0, 2.0, 3.0).toDF("v")
    val sm = MathFunctions.softmax(d, "v", "p").agg(sum("p")).collect()(0).getDouble(0)
    assert(math.abs(sm - 1.0) < 1e-12)
    val z = MathFunctions.zScore(d, "v", "z").agg(avg("z"), stddev("z")).collect()(0)
    assert(math.abs(z.getDouble(0)) < 1e-12 && math.abs(z.getDouble(1) - 1.0) < 1e-12)
  }

  test("natural sort key orders digit runs numerically") {
    val d = Seq("f10", "f2", "f1").toDF("n").sortNaturally("n")
    assert(d.collect().map(_.getString(0)).toSeq == Seq("f1", "f2", "f10"))
    // the reference's well-plate example (tests/functions/
    // test_sort_naturally.py): natsorted order, data uncorrupted
    val wells = Seq(("A21", 1), ("A3", 2), ("A21", 13), ("B2", 3),
      ("B51", 4), ("B12", 7)).toDF("Well", "Value")
    val sorted2 = wells.sortNaturally("Well").collect()
      .map(r => (r.getString(0), r.getInt(1))).toSeq
    assert(sorted2.map(_._1) == Seq("A3", "A21", "A21", "B2", "B12", "B51"))
    assert(sorted2.toSet == Set(("A21", 1), ("A3", 2), ("A21", 13),
      ("B2", 3), ("B51", 4), ("B12", 7)))
    // take_first doctest (tests/functions/test_take_first.py)
    val tf = Seq(("x", 0), ("x", 1), ("y", 2), ("y", 3)).toDF("a", "b")
      .takeFirst(Seq("a"), "b").orderBy("a").collect()
      .map(r => (r.getString(0), r.getInt(1))).toSeq
    assert(tf == Seq(("x", 0), ("y", 2)))
  }

  test("strip_accents expression") {
    val d = Seq("Crème Brûlée").toDF("s")
    assert(d.select(gx.strip_accents(col("s"))).collect()(0).getString(0) == "Creme Brulee")
  }

  test("processText dispatch: slice, zfill, title, count") {
    val c = col("s")
    val d = Seq("ab cd ab").toDF("s")
    def run(m: String, args: Seq[Any] = Nil) =
      d.select(TextOps.strMethod(c, m, args)).collect()(0)
    assert(run("slice", Seq(0, 2)).getString(0) == "ab")
    // full python slice/get semantics (empirically pinned against the
    // reference): negative indices from the end, clamped; missing stop =
    // len; get out of range -> null
    def runOn(v: String, m: String, args: Seq[Any]) =
      Seq(v).toDF("s").select(TextOps.strMethod(col("s"), m, args)).collect()(0)
    assert(runOn("abcdef", "slice", Seq(-3)).getString(0) == "def")
    assert(runOn("xy", "slice", Seq(-3)).getString(0) == "xy")
    assert(runOn("abcdef", "slice", Seq(1, 3)).getString(0) == "bc")
    assert(runOn("xy", "slice", Seq(1, 3)).getString(0) == "y")
    assert(runOn("abcdef", "slice", Seq(-4, -1)).getString(0) == "cde")
    assert(runOn("xy", "slice", Seq(-4, -1)).getString(0) == "x")
    assert(runOn("", "slice", Seq(-3)).getString(0) == "")
    assert(runOn("abcdef", "get", Seq(1)).getString(0) == "b")
    assert(runOn("x", "get", Seq(1)).isNullAt(0))
    assert(runOn("abcdef", "get", Seq(-1)).getString(0) == "f")
    assert(runOn("", "get", Seq(-1)).isNullAt(0))
    assert(runOn("abcdef", "get", Seq(9)).isNullAt(0))
    assert(run("zfill", Seq(10)).getString(0) == "00ab cd ab")
    assert(run("title").getString(0) == "Ab Cd Ab")
    assert(run("count", Seq("ab")).getInt(0) == 2)
    assert(run("len").getInt(0) == 8)
    assert(run("removeprefix", Seq("ab ")).getString(0) == "cd ab")
    assert(run("removesuffix", Seq(" ab")).getString(0) == "ab cd")
    assert(run("removeprefix", Seq("zz")).getString(0) == "ab cd ab")
    assert(!run("isdigit").getBoolean(0))
    assert(run("islower").getBoolean(0))
    assert(!run("isupper").getBoolean(0))
    intercept[IllegalArgumentException](run("nope"))
    val mixed = Seq("AbC1 é").toDF("s")
    assert(mixed.select(TextOps.strMethod(col("s"), "swapcase"))
      .collect()(0).getString(0) == "aBc1 É")
  }

  test("processText dispatch: cat, wrap, normalize, partition, translate") {
    val c = col("s")
    val d = Seq("one two three").toDF("s")
    def run(m: String, args: Seq[Any] = Nil) =
      d.select(TextOps.strMethod(c, m, args)).collect()(0)
    assert(run("cat", Seq("|", "X", "Y")).getString(0) == "one two three|X|Y")
    assert(run("wrap", Seq(7)).getString(0) == "one two\nthree")
    assert(run("translate", Seq("oe", "0")).getString(0) == "0n tw0 thr")
    val p = run("partition", Seq(" ")).getStruct(0)
    assert((p.getString(0), p.getString(1), p.getString(2)) == ("one", " ", "two three"))
    val noSep = d.select(TextOps.strMethod(c, "partition", Seq("|"))).collect()(0).getStruct(0)
    assert((noSep.getString(0), noSep.getString(1), noSep.getString(2)) == ("one two three", "", ""))
    // NFC fuses decomposed e + combining acute into one codepoint
    val dec = Seq("caf" + "é").toDF("s")
    assert(dec.select(TextOps.strMethod(col("s"), "normalize", Seq("NFC")))
      .collect()(0).getString(0) == "café")
    intercept[IllegalArgumentException](run("normalize", Seq("BAD")))
  }

  test("processText dispatch: round-14 parity methods vs python semantics") {
    val c = col("s")
    val d = Seq("one two three").toDF("s")
    def run(m: String, args: Seq[Any] = Nil) =
      d.select(TextOps.strMethod(c, m, args)).collect()(0)
    // python: "one two three"[0:3] -> "one"; slice_replace(0,3,"X") -> "X two three"
    assert(run("slice_replace", Seq(0, 3, "X")).getString(0) == "X two three")
    // CPython: "ab".center(5, ".") == "..ab." — the extra pad goes LEFT
    // when margin and width are both odd; ".abc.." / ".ab." otherwise
    assert(Seq("ab").toDF("s").select(TextOps.strMethod(c, "center", Seq(5, ".")))
      .collect()(0).getString(0) == "..ab.")
    assert(Seq("abc").toDF("s").select(TextOps.strMethod(c, "center", Seq(6, ".")))
      .collect()(0).getString(0) == ".abc..")
    assert(Seq("ab").toDF("s").select(TextOps.strMethod(c, "center", Seq(4, ".")))
      .collect()(0).getString(0) == ".ab.")
    assert(run("center", Seq(5)).getString(0) == "one two three") // len >= width
    assert(run("pad", Seq(15, "left", "_")).getString(0) == "__one two three")
    assert(run("pad", Seq(15, "right", "_")).getString(0) == "one two three__")
    // python pad/zfill never truncate (lpad/rpad do)
    assert(run("pad", Seq(3, "left", "_")).getString(0) == "one two three")
    assert(run("zfill", Seq(3)).getString(0) == "one two three")
    assert(run("ljust", Seq(3)).getString(0) == "one two three")
    assert(run("findall", Seq("[a-z]+")).getSeq[String](0) ==
      Seq("one", "two", "three"))
    assert(run("match", Seq("one")).getBoolean(0))
    assert(!run("match", Seq("two")).getBoolean(0)) // anchored at start
    assert(run("fullmatch", Seq("[a-z ]+")).getBoolean(0))
    assert(!run("fullmatch", Seq("one")).getBoolean(0)) // must span the whole
    // python "one two three".rfind(" ") == 7; rfind of absent -> -1
    assert(run("rfind", Seq(" ")).getInt(0) == 7)
    assert(run("rfind", Seq("|")).getInt(0) == -1)
    assert(run("rindex", Seq(" ")).getInt(0) == 7)
    val rp = run("rpartition", Seq(" ")).getStruct(0)
    assert((rp.getString(0), rp.getString(1), rp.getString(2)) ==
      ("one two", " ", "three"))
    val rpAbsent = run("rpartition", Seq("|")).getStruct(0)
    assert((rpAbsent.getString(0), rpAbsent.getString(1), rpAbsent.getString(2)) ==
      ("", "", "one two three")) // python: ('', '', whole) from the right
    assert(Seq("abc").toDF("s").select(TextOps.strMethod(c, "join", Seq("-")))
      .collect()(0).getString(0) == "a-b-c")
    assert(Seq("42").toDF("s").select(TextOps.strMethod(c, "isdecimal"))
      .collect()(0).getBoolean(0))
    assert(!run("isdecimal").getBoolean(0))
    assert(Seq("One Two").toDF("s").select(TextOps.strMethod(c, "istitle"))
      .collect()(0).getBoolean(0))
    assert(!run("istitle").getBoolean(0))
    // encode -> binary -> decode round-trips
    assert(d.select(TextOps.strMethod(
        TextOps.strMethod(c, "encode", Seq("UTF-8")), "decode", Seq("UTF-8")))
      .collect()(0).getString(0) == "one two three")
    // DataFrame-producing methods rejected, mirroring the reference's
    // ValueError (process_text.py:110-115)
    intercept[IllegalArgumentException](run("extractall", Seq("(a)")))
    intercept[IllegalArgumentException](run("get_dummies"))
  }

  test("convertStock resolves tickers case-insensitively") {
    import graft.operators.DomainOps
    val d = Seq((1, "aapl"), (2, "MSFT"), (3, "zzzz")).toDF("id", "tick")
    val out = DomainOps.convertStock(spark, d, "tick").orderBy("id").collect()
    assert(out(0).getString(2) == "Apple Inc.")
    assert(out(1).getString(2) == "Microsoft Corporation")
    assert(out(2).isNullAt(2))
  }

  test("concatenateColumns ignoreEmpty drops empty segments; nulls keep the sep when off") {
    val d = Seq(("a", "", "c")).toDF("x", "y", "z")
    assert(d.concatenateColumns(Seq("x", "y", "z"), "out", "-", ignoreEmpty = true)
      .collect()(0).getString(3) == "a-c")
    assert(d.concatenateColumns(Seq("x", "y", "z"), "out", "-", ignoreEmpty = false)
      .collect()(0).getString(3) == "a--c")
    // nulls behave like empties: placeholder segment when ignoreEmpty=false,
    // stripped when true (the pandas "nan" literal is a stringification
    // artifact we deliberately do not replicate)
    val withNull = Seq(("a", Option.empty[String], "c")).toDF("x", "y", "z")
    assert(withNull.concatenateColumns(Seq("x", "y", "z"), "out", "-",
      ignoreEmpty = false).collect()(0).getString(3) == "a--c")
    assert(withNull.concatenateColumns(Seq("x", "y", "z"), "out", "-")
      .collect()(0).getString(3) == "a-c")
    // the reference's JanitorError: at least two columns
    intercept[IllegalArgumentException](
      d.concatenateColumns(Seq("x"), "out"))
  }
}
