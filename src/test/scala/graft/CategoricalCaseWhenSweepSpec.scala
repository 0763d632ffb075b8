package graft

import graft.operators.{TransformOps, TypeOps}
import graft.syntax._
import org.apache.spark.sql.functions._

/** Round-17 fidelity sweep over tests/functions/test_encode_categorical.py
  * (287 LoC) and test_case_when.py (247 LoC) — the category-registry and
  * dispatch surfaces least exercised by golden values (VERDICT r16 #6).
  */
class CategoricalCaseWhenSweepSpec extends SparkSpec {
  import spark.implicits._

  test("encode_categorical nulls values outside an explicit category set") {
    // pandas astype(CategoricalDtype(categories=[4,5,6])) on numbers 1..3
    // yields all-NaN (test_warnings' mismatch scenario) — the registry
    // stamp must not silently keep out-of-set values
    val df = Seq((1, "John"), (2, "Mark"), (3, "Luke")).toDF("numbers", "names")
    val out = TypeOps.encodeCategorical(df, "numbers", Seq("4", "5", "6"),
      checkValues = true)
    assert(out.filter(col("numbers").isNotNull).count() === 0)
    // partial overlap keeps only the in-set values
    val part = TypeOps.encodeCategorical(df, "names", Seq("John", "Luke", "Paul"))
    assert(part.filter(col("names").isNotNull).count() === 2)
    // the registry carries the full provided set, not just the observed one
    assert(TypeOps.categoriesOf(part, "names") === Some(Seq("John", "Luke", "Paul")))
  }

  test("encode_categorical error contracts (empty/non-unique/null/bad order)") {
    val df = Seq((1, "a")).toDF("a", "b")
    intercept[IllegalArgumentException](
      TypeOps.encodeCategorical(df, "a", Nil))
    intercept[IllegalArgumentException](
      TypeOps.encodeCategorical(df, "a", Seq("1", "2", "2")))
    intercept[IllegalArgumentException](
      TypeOps.encodeCategorical(df, "a", Seq("1", null)))
    intercept[IllegalArgumentException](
      TypeOps.encodeCategoricalOrder(df, "a", "sorted"))
    // all-null column cannot infer categories (test_empty_col_sort /
    // test_empty_col_appearance)
    val nulls = Seq((None: Option[Int], "x")).toDF("c", "d")
    intercept[IllegalArgumentException](
      TypeOps.encodeCategoricalOrder(nulls, "c", "sort"))
    intercept[IllegalArgumentException](
      TypeOps.encodeCategoricalOrder(nulls, "c", "appearance", orderCol = Some("d")))
    // ... and cannot anchor an explicit-category comparison either
    // (test_empty_col: uniques.empty raises before the mismatch warnings)
    intercept[IllegalArgumentException](
      TypeOps.encodeCategorical(nulls, "c", Seq("1", "2", "3"), checkValues = true))
    // a missing column raises at analysis like the reference's KeyError
    // (test_encode_categorical_missing_column)
    intercept[Exception](
      TypeOps.encodeCategorical(Seq((1, "a")).toDF("a", "b"), "aloha",
        Seq("x")).collect())
  }

  test("encode_categorical order registries: sort = sorted distinct, appearance = first seen") {
    // golden form of test_all_cat_None_1/_2: the registry IS factorize's
    // category order — sort=True -> lexicographic; sort=False -> first-seen
    val df = Seq((1, "Mark"), (2, "John"), (3, "Luke"), (4, "John"), (5, "Abe"))
      .toDF("ord", "names")
    val sorted_ = TypeOps.encodeCategoricalOrder(df, "names", "sort")
    assert(TypeOps.categoriesOf(sorted_, "names") ===
      Some(Seq("Abe", "John", "Luke", "Mark")))
    val appear = TypeOps.encodeCategoricalOrder(df, "names", "appearance",
      orderCol = Some("ord"))
    assert(TypeOps.categoriesOf(appear, "names") ===
      Some(Seq("Mark", "John", "Luke", "Abe")))
    // explicit-array mode registers the GIVEN order, verbatim
    // (test_all_cat_not_None: CategoricalDtype(categories=[3,1,2]))
    val nums = TypeOps.encodeCategorical(df, "ord", Seq("3", "1", "2"))
    assert(TypeOps.categoriesOf(nums, "ord") === Some(Seq("3", "1", "2")))
  }

  test("encode_categorical warnings: reference direction plus the engine-added reverse") {
    // capture stderr: values-missing-from-categories is the REFERENCE's
    // warning (encode_categorical.py:241-258 — both its branches warn in
    // that one direction; test_warnings); categories-never-occurring is an
    // engine ADDITION the reference does not emit (documented at the
    // TypeOps call site)
    val df = Seq((1, "John"), (2, "Mark"), (3, "Luke")).toDF("numbers", "names")
    def captured(body: => Unit): String = {
      val buf = new java.io.ByteArrayOutputStream()
      Console.withErr(new java.io.PrintStream(buf)) {
        val old = System.err
        System.setErr(new java.io.PrintStream(buf))
        try body finally System.setErr(old)
      }
      buf.toString("UTF-8")
    }
    val bothWays = captured {
      TypeOps.encodeCategorical(df, "names", Seq("John", "Mark", "Paul"),
        checkValues = true).collect()
    }
    assert(bothWays.contains("missing from the provided categories"))
    assert(bothWays.contains("never occur"))
    // full overlap: silent
    val clean = captured {
      TypeOps.encodeCategorical(df, "names", Seq("John", "Mark", "Luke"),
        checkValues = true).collect()
    }
    assert(!clean.contains("WARNING"))
  }

  test("case_when: first matching condition wins across overlaps (test_case_when_1)") {
    // typed analog of the docstring frame: conditions overlap on purpose
    val df = Seq((0, 0, 6), (0, 3, 7), (1, 4, 8), (2, 5, 9), (0, 0, 10))
      .toDF("a", "b", "c")
    val out = TransformOps.caseWhen(df, "value", Seq(
      ((col("a") === 0 && col("b") =!= 0) || col("c") === 10, col("a")),
      (col("b") === 0 && col("a") === 0, lit(-1))),
      default = col("c"))
      .orderBy("c").select("value").collect().map(_.getInt(0)).toSeq
    // row1: cond2 (a=0,b=0) -> -1; row2: cond1 -> a=0; rows 3,4: default c;
    // row5: cond1 via c==10 -> a=0 (cond1 evaluated BEFORE cond2)
    assert(out === Seq(-1, 0, 8, 9, 0))
  }

  test("case_when: column default and column replacement (test_case_when_default_array)") {
    val df = Seq((1, 10), (2, 20), (3, 30)).toDF("x", "y")
    val out = TransformOps.caseWhen(df, "z",
      Seq((col("x") % 2 === 1, col("y") * 2)), default = col("y") + 1)
      .orderBy("x").select("z").collect().map(_.getInt(0)).toSeq
    assert(out === Seq(20, 21, 60))
    // column_name may be an existing column: values replaced in place
    val rep = TransformOps.caseWhen(df, "y",
      Seq((col("x") === 2, lit(0))), default = col("y"))
    assert(rep.columns.toSeq === Seq("x", "y"))
    assert(rep.orderBy("x").select("y").collect().map(_.getInt(0)).toSeq ===
      Seq(10, 0, 30))
  }

  test("unionize_dataframe_categories golden (the 3-frame jerbs/fruits/animals fixture)") {
    def cat(df: org.apache.spark.sql.DataFrame, c: String, vals: Seq[String]) =
      TypeOps.encodeCategorical(df, c, vals)
    val df1 = cat(cat(Seq(("fireman", "apple", 1), ("programmer", "banana", 2),
      ("astronaut", "orange", 3)).toDF("jerbs", "fruits", "data"),
      "jerbs", Seq("fireman", "programmer", "astronaut")),
      "fruits", Seq("apple", "banana", "orange"))
    val df2 = cat(cat(cat(Seq(("fireman", "grape", 4, "bear"),
      ("actor", "strawberry", 5, "tiger"), ("astronaut", "cherry", 6, "sloth"))
      .toDF("jerbs", "fruits", "data", "animals"),
      "jerbs", Seq("fireman", "actor", "astronaut")),
      "fruits", Seq("grape", "strawberry", "cherry")),
      "animals", Seq("bear", "tiger", "sloth"))
    val df3 = cat(cat(cat(Seq(("salesman", "grape", 7, "bear"),
      ("actor", "banana", 8, "capybara"), ("programmer", "cherry", 9, "sloth"))
      .toDF("jerbs", "fruits", "data", "animals"),
      "jerbs", Seq("salesman", "actor", "programmer")),
      "fruits", Seq("grape", "banana", "cherry")),
      "animals", Seq("bear", "capybara", "sloth"))
    val Seq(u1, u2, u3) = TypeOps.unionizeAllCategories(Seq(df1, df2, df3))
    def cats(df: org.apache.spark.sql.DataFrame, c: String) =
      TypeOps.categoriesOf(df, c).get.toSet
    // categories unioned per column, identical across carrying frames
    assert(cats(u1, "jerbs") === Set("fireman", "programmer", "astronaut",
      "actor", "salesman"))
    assert(cats(u1, "jerbs") === cats(u2, "jerbs") &&
      cats(u1, "jerbs") === cats(u3, "jerbs"))
    assert(cats(u1, "fruits") === cats(u2, "fruits") &&
      cats(u2, "fruits") === cats(u3, "fruits"))
    assert(cats(u2, "animals") === cats(u3, "animals"))
    // df1 has no animals column and stays without one
    assert(!u1.columns.contains("animals"))
    // values survive (merged superset never nulls an in-registry value)
    assert(u1.filter(col("jerbs").isNull).count() === 0)
    assert(u3.filter(col("fruits").isNull).count() === 0)
    // data columns untouched
    assert(u2.select("data").collect().map(_.getInt(0)).sorted.toSeq === Seq(4, 5, 6))
  }

  test("process_text error contracts (extractall/get_dummies/unknown raise)") {
    val df = Seq("a1", "b2").toDF("text")
    intercept[IllegalArgumentException](
      df.processText("text", "extractall", Seq("(?<letter>[ab])?(?<digit>\\d)")))
    intercept[IllegalArgumentException](
      df.processText("text", "get_dummies"))
    intercept[IllegalArgumentException](
      df.processText("text", "not_a_method"))
  }
}
