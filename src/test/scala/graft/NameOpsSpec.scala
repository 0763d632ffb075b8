package graft

import graft.functions.Norm
import graft.syntax._
import org.apache.spark.sql.functions._

/** clean_names & header verbs — golden cases ported from the reference's
  * canonical dirty frame (reference: tests/conftest.py:16-26 — columns
  * `Bell__Chart`, `decorated-elephant`, `animals@#$%^`).
  */
class NameOpsSpec extends SparkSpec {
  import spark.implicits._

  test("cleanName reproduces the reference doctest matrix") {
    assert(Norm.cleanName("Bell__Chart") == "bell_chart")
    assert(Norm.cleanName("decorated-elephant") == "decorated_elephant")
    assert(Norm.cleanName("animals@#$%^", removeSpecial = true) == "animals")
    assert(Norm.cleanName("Repeat  Spaces") == "repeat_spaces")
    assert(Norm.cleanName("a.b?c(d)e") == "a_b_c_d_e")
    assert(Norm.cleanName("_private_", stripUnderscores = Some("both")) == "private")
    assert(Norm.cleanName("_private_", stripUnderscores = Some("left")) == "private_")
    assert(Norm.cleanName("áéîøü", stripAccentsFlag = true) == "aeiøu") // ø has no combining mark
    assert(Norm.cleanName("CamelCaseColumn", caseType = "snake") == "camel_case_column")
    assert(Norm.cleanName("longcolumnname", truncateLimit = 4) == "long")
    assert(Norm.cleanName("KEEP", caseType = "preserve") == "KEEP")
    assert(Norm.cleanName("keep", caseType = "upper") == "KEEP")
  }

  test("clean_names: the reference test file ported case by case") {
    // tests/functions/test_clean_names.py over the conftest dirty frame
    val dirty = Seq((1, 1.23, 1, "rabbit", "Cambridge"))
      .toDF("a", "Bell__Chart", "decorated-elephant", "animals@#$%^", "cities")
    // method chain, default args (strip_underscores=None — reference default)
    assert(dirty.cleanNames().columns.toSet ==
      Set("a", "bell_chart", "decorated_elephant", "animals@#$%^", "cities"))
    // remove_special
    assert(dirty.cleanNames(removeSpecial = true).columns.toSet ==
      Set("a", "bell_chart", "decorated_elephant", "animals", "cities"))
    // case_type = upper
    assert(dirty.cleanNames(caseType = "upper", removeSpecial = true).columns.toSet ==
      Set("A", "BELL_CHART", "DECORATED_ELEPHANT", "ANIMALS", "CITIES"))
    // strip_underscores parametrize: both/true/right/r/left/l
    def renamed(f: String => String) =
      dirty.select(dirty.columns.map(c => col(s"`$c`").as(f(c))).toIndexedSeq: _*)
    for (su <- Seq("both", "true")) {
      assert(renamed(c => s"_${c}_").cleanNames(removeSpecial = true,
        stripUnderscores = Some(su)).columns.toSet ==
        Set("a", "bell_chart", "decorated_elephant", "animals", "cities"))
    }
    for (su <- Seq("right", "r")) {
      assert(renamed(c => s"${c}_").cleanNames(removeSpecial = true,
        stripUnderscores = Some(su)).columns.toSet ==
        Set("a", "bell_chart", "decorated_elephant", "animals", "cities"))
    }
    for (su <- Seq("left", "l")) {
      assert(renamed(c => s"_$c").cleanNames(removeSpecial = true,
        stripUnderscores = Some(su)).columns.toSet ==
        Set("a", "bell_chart", "decorated_elephant", "animals", "cities"))
    }
    // strip_accents: João / Лука́ся / Käfer
    val accented = Seq((1, 1, 1)).toDF("João", "Лука́ся", "Käfer")
    assert(accented.cleanNames(stripAccents = true).columns.toSet ==
      Set("joao", "лукася", "kafer"))
    // invalid strip_underscores raises (reference JanitorError)
    intercept[IllegalArgumentException](
      dirty.cleanNames(stripUnderscores = Some("hello")).columns)
    // case_type = preserve
    assert(dirty.cleanNames(caseType = "preserve").columns.toSet ==
      Set("a", "Bell_Chart", "decorated_elephant", "animals@#$%^", "cities"))
    // camelCase -> snake (single and multi)
    assert(Seq(1).toDF("AColumnName").cleanNames(caseType = "snake")
      .columns.toSeq == Seq("a_column_name"))
    assert(Seq((1, 2, 3)).toDF("snakesOnAPlane", "SnakesOnAPlane2", "snakes_on_a_plane3")
      .cleanNames(caseType = "snake", stripUnderscores = Some("true"),
        removeSpecial = true).columns.toSeq ==
      Seq("snakes_on_a_plane", "snakes_on_a_plane2", "snakes_on_a_plane3"))
    // truncate_limit
    assert(dirty.cleanNames(truncateLimit = 7).columns.toSet ==
      Set("a", "bell_ch", "decorat", "animals", "cities"))
    // test_charac: % survives default cleaning, parens/spaces -> _
    assert(Seq(1).toDF(raw"Current accountbalance(in % of GDP)")
      .cleanNames(stripUnderscores = Some("true")).columns.toSeq ==
      Seq("current_accountbalance_in_%_of_gdp"))
  }

  test("cleanNames dedupes colliding labels like the dup-column fixture") {
    // reference: tests/conftest.py:124-135 (a, A, a* collide after cleaning)
    val df = Seq((1, 2, 3)).toDF("a", "A", "a*")
    assert(df.cleanNames(removeSpecial = true).columns.toSeq == Seq("a", "a_1", "a_2"))
  }

  test("limitColumnCharacters truncates and suffixes duplicates") {
    val df = Seq((1, 2, 3)).toDF("column_one", "column_two", "col")
    assert(df.limitColumnCharacters(6).columns.toSeq == Seq("column", "column_1", "col"))
  }

  test("rowToNames joins multiple promoted rows with the separator") {
    val df = Seq((0, "x", "u"), (1, "y", "v"), (2, "9", "8")).toDF("ord", "c1", "c2")
    val out = df.rowToNames("ord", Seq(0, 1), removeRows = true)
    assert(out.columns.toSeq == Seq("0_1", "x_y", "u_v"))
    assert(out.count() == 1)
  }

  test("rowToNames removeRowsAbove keeps all promoted header rows when removeRows=false") {
    val df = Seq((0, "junk"), (1, "h1"), (2, "h2"), (3, "data")).toDF("ord", "c")
    val out = df.rowToNames("ord", Seq(1, 2), removeRows = false, removeRowsAbove = true)
    // only the row ABOVE the first header row goes; headers 1 and 2 stay
    assert(out.columns.toSeq == Seq("1_2", "h1_h2"))
    assert(out.count() == 3)
  }

  test("collapseLevels/explodeIndex round-trip struct columns") {
    val df = Seq((1, 2.0, "z")).toDF("id", "m_v", "m_k")
    val round = df.explodeIndex("_").collapseLevels("_")
    assert(round.columns.toSeq == Seq("id", "m_v", "m_k"))
    assert(round.collect()(0).getDouble(1) == 2.0)
  }

  test("collapse_levels axis=index collapses explicit index columns (test_glue_output)") {
    // the mi_index fixture's {A}{B}{C}{D} glue, re-expressed over explicit
    // index columns: values concatenate per row with no separator
    val df = Seq(("A0", "B0", "C0", "D0", 1), ("A1", "B1", "C1", "D1", 2))
      .toDF("A", "B", "C", "D", "v")
    val glued = df.collapseLevelsRows(Seq("A", "B", "C", "D"),
      glue = Some("{A}{B}{C}{D}"))
    assert(glued.columns.toSeq == Seq("index", "v"))
    assert(glued.orderBy("v").collect().map(_.getString(0)).toSeq ==
      Seq("A0B0C0D0", "A1B1C1D1"))
    // glue templates carry literals between placeholders
    val custom = df.collapseLevelsRows(Seq("A", "B"), glue = Some("{A}-{B}!"))
    assert(custom.orderBy("v").collect().map(_.getString(0)).head == "A0-B0!")
    // sep form joins stringified level values
    val sepped = df.collapseLevelsRows(Seq("A", "B"), sep = Some("_"))
    assert(sepped.orderBy("v").collect().map(_.getString(0)).head == "A0_B0")
    // the collapsed column lands at the first index column's position
    val moved = Seq((1, "x", "y", 2.0)).toDF("v1", "A", "B", "v2")
      .collapseLevelsRows(Seq("A", "B"), sep = Some("_"))
    assert(moved.columns.toSeq == Seq("v1", "index", "v2"))
    // sep+glue exclusion holds on the row axis too (test_sep_and_glue)
    intercept[IllegalArgumentException](
      df.collapseLevelsRows(Seq("A"), sep = Some("_"), glue = Some("_")))
    // unknown placeholder / unknown index column raise
    intercept[IllegalArgumentException](
      df.collapseLevelsRows(Seq("A"), glue = Some("{Z}")))
    intercept[IllegalArgumentException](
      df.collapseLevelsRows(Seq("nope"), sep = Some("_")))
  }

  test("collapse_levels glue template and sep/glue exclusion (test_glue_output)") {
    val df = Seq((1, 2.0, "z")).toDF("id", "m_v", "m_k").explodeIndex("_")
    assert(df.collapseLevelsWith(glue = Some("{0}.{1}!")).columns.toSeq ==
      Seq("id", "m.v!", "m.k!"))
    intercept[IllegalArgumentException](
      df.collapseLevelsWith(sep = Some("_"), glue = Some("_")))
  }

  test("explode_index names_pattern splits labels by capture groups") {
    // test_names_pattern: (?P<a>.+)_(?P<b>.+) over fam_id
    val df = Seq((1, 2.0)).toDF("fam_id", "other")
    val out = df.explodeIndexPattern("(?P<a>.+)_(?P<b>.+)")
    assert(out.columns.toSeq == Seq("fam", "other"))
    assert(out.schema("fam").dataType.isInstanceOf[org.apache.spark.sql.types.StructType])
    assert(out.select("fam.id").collect()(0).getInt(0) == 1)
    intercept[IllegalArgumentException](df.explodeIndexPattern("(.+)"))
  }

  test("cleanNamesValues cleans cell values not labels") {
    val df = Seq(Tuple1("A b-C")).toDF("v")
    assert(df.cleanNamesValues(Seq("v")).collect()(0).getString(0) == "a_b_c")
  }

  test("cleanNamesValues matches the reference value-mode matrix") {
    // test_clean_column_values: "Abçdê fgí j" -> "abcde_fgi_j"
    val raw = Seq(Tuple1("Abçdê fgí j")).toDF("raw")
    assert(raw.cleanNamesValues(Seq("raw")).collect()(0).getString(0) == "abcde_fgi_j")
    // axis=None + column_names=None raises (clean_names.py:121-123)
    val err = intercept[IllegalArgumentException](raw.cleanNamesValues(Seq.empty))
    assert(err.getMessage.contains("Kindly provide an argument to `column_names`"))
    // NBSP is _normalize_1's third FIX; remove_special pairs with strip()
    val nbsp = Seq(Tuple1("a b")).toDF("v")
    assert(nbsp.cleanNamesValues(Seq("v")).collect()(0).getString(0) == "a_b")
    // spaces become _ BEFORE remove_special's strip(), so edges survive
    val special = Seq(Tuple1(" keep me ")).toDF("v")
    assert(special.cleanNamesValues(Seq("v"), removeSpecial = true)
      .collect()(0).getString(0) == "_keep_me_")
    // truncate_limit applies to values too (_clean_names is shared)
    val long = Seq(Tuple1("bell chart")).toDF("v")
    assert(long.cleanNamesValues(Seq("v"), truncateLimit = 7)
      .collect()(0).getString(0) == "bell_ch")
  }
}
