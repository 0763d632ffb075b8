package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.syntax._
import graft.Tables._
import graft.functions.MathFunctions
import graft.operators.ReshapeOps

/** Correctness-gate queries for SURVEY §2.1-2.3, §2.5, §2.7-2.10, §2.12 verbs.
  * Each entry exercises one verb over the driver parquet tables; the oracle is
  * the equivalent DuckDB SQL with identical output column names. Floating
  * aggregates whose summation order is engine-dependent are rounded on both
  * sides.
  */
object QueriesCore {
  private type Q = (SparkSession, String) => DataFrame

  val entries: Map[String, Q] = Map(
    // ----- §2.1 name hygiene -----
    "clean_names" -> ((s, d) => lineitem(s, d)
      .select(col("l_orderkey").as("L OrderKey?"),
        col("l_quantity").as("Quantity (Units)"),
        col("l_returnflag").as("Return-Flag"))
      .cleanNames()),
    "rename_column" -> ((s, d) => lineitem(s, d)
      .select("l_orderkey", "l_linenumber", "l_quantity")
      .renameColumn("l_quantity", "qty")),
    "rename_columns" -> ((s, d) => lineitem(s, d)
      .select("l_orderkey", "l_linenumber", "l_quantity")
      .renameColumns(fn = Some(_.toUpperCase))),
    "limit_column_characters" -> ((s, d) => lineitem(s, d)
      .select("l_orderkey", "l_linenumber", "l_quantity")
      .limitColumnCharacters(5)),
    "collapse_levels" -> ((s, d) => events(s, d)
      .select(struct(col("value").as("v"), col("user_id").as("u")).as("m"), col("event_id"))
      .collapseLevels("_")),

    // ----- §2.2 selection -----
    "select_columns" -> ((s, d) => lineitem(s, d)
      .selectColumns(ColumnSelector.glob("*key"))),
    "select_rows_labels" -> ((s, d) => nation(s, d)
      .selectRows("n_nationkey", RowSelector.Labels(Seq(1, 5, 10)))),
    "expand_grid_frames" -> ((s, d) => ReshapeOps.expandGridFrames(Seq(
      "r" -> region(s, d).select("r_regionkey", "r_name"),
      "n" -> nation(s, d).filter(col("n_nationkey") < 3)
        .select("n_nationkey", "n_name")))),
    "select_rows_invert" -> ((s, d) => nation(s, d)
      .selectRows("n_nationkey", RowSelector.Labels(Seq(1, 5, 10)), invert = true)),
    "select_rows_slice_step" -> ((s, d) => customer(s, d)
      .select("c_custkey", "c_name", "c_acctbal")
      .selectRows("c_custkey",
        RowSelector.LabelSlice(Some(1), Some(120), step = 3))),
    "select_rows_date_prefix" -> ((s, d) => lineitem(s, d)
      .select("l_orderkey", "l_linenumber", "l_shipdate")
      .selectRows("l_shipdate", RowSelector.DateStr("1996-03"))),
    "remove_columns" -> ((s, d) => lineitem(s, d)
      .removeColumns("l_tax", "l_returnflag", "l_linestatus")),
    "reorder_columns" -> ((s, d) => lineitem(s, d)
      .reorderColumns("l_quantity", "l_orderkey")),
    "move" -> ((s, d) => lineitem(s, d)
      .moveColumn("l_quantity", "l_orderkey", "before")),
    // sequence move (test_move.py test_move_source_target_seq): block
    // insertion via the searchsorted rule; the driver compare is
    // order-blind, SelectColumnsSweepSpec pins the order
    "move_seq" -> ((s, d) => lineitem(s, d)
      .moveColumns(
        Seq(ColumnSelector.Exact("l_shipdate"), ColumnSelector.Exact("l_orderkey")),
        Seq(ColumnSelector.Exact("l_partkey"), ColumnSelector.Exact("l_suppkey")),
        position = "after")),
    // row-axis move (move.py axis=0, test_move.py:11-94): the new
    // presentation order is emitted as a 0-based row_pos column
    "move_rows" -> ((s, d) => nation(s, d)
      .moveRows("n_name", "NATION_3", "NATION_17", position = "after")),
    // combined two-axis select with invert on both (test_select.py test_invert)
    "select_both" -> ((s, d) => nation(s, d)
      .selectBoth("n_nationkey",
        rows = Some(RowSelector.Labels(Seq(1, 5, 10))),
        columns = Seq(ColumnSelector.Exact("n_name")), invert = true)),
    // column-list change_type (test_change_type.py test_multiple_columns)
    "change_types" -> ((s, d) => lineitem(s, d)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_discount")
      .changeTypes(Seq("l_quantity", "l_discount"), "string")),
    // glue template collapse (test_collapse_levels.py test_glue_output)
    "collapse_glue" -> ((s, d) => events(s, d)
      .select(struct(col("value").as("v"), col("user_id").as("u")).as("m"), col("event_id"))
      .collapseLevelsWith(glue = Some("{0}X{1}"))),
    // axis="index" collapse over explicit index columns (test_glue_output's
    // {A}{B}{C}{D} re-expressed; one narrow projection)
    "collapse_levels_rows" -> ((s, d) => lineitem(s, d)
      .select("l_returnflag", "l_linestatus", "l_orderkey", "l_linenumber", "l_quantity")
      .collapseLevelsRows(Seq("l_returnflag", "l_linestatus"),
        glue = Some("{l_returnflag}-{l_linestatus}"))),
    // names_pattern explode (test_explode_index.py test_names_pattern),
    // collapsed back so the oracle stays flat SQL
    "explode_pattern" -> ((s, d) => events(s, d)
      .select("event_id", "user_id", "value")
      .explodeIndexPattern("(?P<a>.+)_(?P<b>.+)")
      .collapseLevels("_")),
    "drop_constant_columns" -> ((s, d) => lineitem(s, d)
      .addColumn("const_col", lit(1))
      .addColumn("all_null", lit(null).cast("int"))
      .dropConstantColumns()),
    // nth_index=0 drops the FIRST occurrence and keeps the rest
    // (drop_duplicate_columns.py doctest) — the surviving q is l_discount
    "drop_duplicate_columns" -> ((s, d) => {
      val li = lineitem(s, d)
      li.select(col("l_orderkey"), col("l_linenumber"),
        col("l_quantity").as("q"), col("l_discount").as("q"))
        .dropDuplicateColumns("q", nth = 0)
    }),

    // ----- §2.3 filters -----
    "filter_string" -> ((s, d) => part(s, d).filterString("p_name", "^red", regex = true)),
    "filter_on" -> ((s, d) => lineitem(s, d)
      .filterOn("l_quantity > 30 AND l_discount < 0.05")),
    "filter_date" -> ((s, d) => lineitem(s, d)
      .select("l_orderkey", "l_linenumber", "l_shipdate")
      .filterDate("l_shipdate", years = Seq(1997), months = Seq(1, 2, 3))),
    "filter_date_range" -> ((s, d) => lineitem(s, d)
      .select("l_orderkey", "l_linenumber", "l_shipdate")
      .filterDate("l_shipdate",
        startDate = Some("1997-06-01"), endDate = Some("1997-08-31"))),
    "filter_column_isin" -> ((s, d) => orders(s, d)
      .filterColumnIsin("o_orderpriority", Seq("1-URGENT", "2-HIGH"))),
    "dropnotnull" -> ((s, d) => events(s, d)
      .select("event_id", "user_id", "value")
      .addColumn("v", when(col("value") < 2, col("value")))
      .dropNotNull("v")),
    "remove_empty" -> ((s, d) => events(s, d)
      .select(col("event_id"), col("user_id"), when(col("value") < 0, col("value")).as("neg"))
      .removeEmpty()),
    "get_dupes" -> ((s, d) => lineitem(s, d)
      .select("l_orderkey", "l_linenumber", "l_partkey")
      .getDupes("l_partkey")),
    "update_where" -> ((s, d) => lineitem(s, d)
      .select("l_orderkey", "l_linenumber", "l_discount")
      .updateWhere("l_discount > 0.05", "flag", 1)),

    // ----- §2.5 grouped / window -----
    "groupby_agg" -> ((s, d) => lineitem(s, d)
      .select("l_orderkey", "l_linenumber", "l_quantity")
      .groupbyAgg(Seq("l_orderkey"), "l_quantity", "sum", "sum_qty")),
    // nunique rides the window form (size AROUND the windowed collect_set —
    // regression gate for the analysis bug the equivalence spec caught)
    "groupby_agg_nunique" -> ((s, d) => lineitem(s, d)
      .select("l_orderkey", "l_linenumber", "l_returnflag")
      .groupbyAgg(Seq("l_orderkey"), "l_returnflag", "nunique", "n_flags")),
    // identical semantics, skew-immune physical shape (agg + AQE-broadcast
    // join-back) — same window oracle proves the equivalence
    "groupby_agg_skew" -> ((s, d) => lineitem(s, d)
      .select("l_orderkey", "l_linenumber", "l_quantity")
      .transform(df => operators.GroupedOps.groupbyAggSkewSafe(
        df, Seq("l_orderkey"), "l_quantity", "sum", "sum_qty"))),
    "groupby_agg_dropna" -> ((s, d) => lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"),
        when(col("l_returnflag") =!= "N", col("l_returnflag")).as("flag"),
        col("l_quantity"))
      .groupbyAgg(Seq("flag"), "l_quantity", "sum", "sum_qty", dropna = true)),
    "groupby_topk" -> ((s, d) => lineitem(s, d)
      .select("l_orderkey", "l_linenumber", "l_returnflag", "l_extendedprice")
      .groupbyTopk(Seq("l_returnflag"), "l_extendedprice", 3,
        ascending = false, tiebreak = Seq("l_orderkey", "l_linenumber"))),
    "groupby_topk_asc" -> ((s, d) => lineitem(s, d)
      .select("l_orderkey", "l_linenumber", "l_returnflag", "l_extendedprice")
      .groupbyTopk(Seq("l_returnflag"), "l_extendedprice", 3,
        ascending = true, tiebreak = Seq("l_orderkey", "l_linenumber"))),
    "groupby_topk_salted" -> ((s, d) => lineitem(s, d)
      .select("l_orderkey", "l_linenumber", "l_returnflag", "l_extendedprice")
      .transform(df => operators.GroupedOps.groupbyTopkSalted(df,
        Seq("l_returnflag"), "l_extendedprice", 3, ascending = false,
        tiebreak = Seq("l_orderkey", "l_linenumber")))),
    "take_first" -> ((s, d) => lineitem(s, d)
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_shipdate")
      .takeFirst(Seq("l_partkey"), "l_shipdate", ascending = true,
        tiebreak = Seq("l_orderkey", "l_linenumber"))),
    "count_cumulative_unique" -> ((s, d) => events(s, d)
      .select("event_id", "user_id")
      .countCumulativeUnique("user_id", "event_id", "cum_unique")),
    // case_sensitive=False kwarg mode (count_cumulative_unique.py:17): mixed
    // case is synthesized so the fold actually matters
    "count_cumulative_unique_ci" -> ((s, d) => events(s, d)
      .select(col("event_id"),
        when(col("event_id") % 2 === 0, upper(col("event_type")))
          .otherwise(col("event_type")).as("etype"))
      .countCumulativeUnique("etype", "event_id", "cum_unique",
        caseSensitive = false)),
    "shuffle" -> ((s, d) => events(s, d)
      .select("event_id", "user_id", "value").shuffleRows(seed = 7L)),
    "sort_naturally" -> ((s, d) => part(s, d)
      .select(concat(lit("p"), col("p_partkey")).as("tag"))
      .sortNaturally("tag").limit(20)),
    "sort_column_value_order" -> ((s, d) => {
      val order = Seq("signup", "click", "view", "purchase", "error")
      events(s, d).select("event_id", "event_type")
        .addColumn("type_rank", operators.GroupedOps.valueRank("event_type", order))
        .sortColumnValueOrder("event_type", order)
    }),
    "toset" -> ((s, d) => lineitem(s, d).toSetOf("l_returnflag")),

    // ----- §2.7 missing data -----
    "fill_direction" -> ((s, d) => events(s, d)
      .select(col("event_id"), col("event_type"),
        when(col("event_type") === "click", col("value")).as("v"))
      .fillDirection(Map("v" -> "down"), "event_id")),
    "fill_direction_downup" -> ((s, d) => events(s, d)
      .select(col("event_id"), col("event_type"),
        when(col("event_type") === "click", col("value")).as("v"))
      .fillDirection(Map("v" -> "downup"), "event_id")),
    "fill_direction_grouped" -> ((s, d) => events(s, d)
      .select(col("event_id"), col("event_type"),
        when(col("value") >= 1, col("value")).as("v"))
      .fillDirection(Map("v" -> "down"), "event_id", partitionBy = Seq("event_type"))),
    "find_replace_regex" -> ((s, d) => events(s, d)
      .select(col("event_id"), col("event_type"))
      .findReplace("event_type", Map("^cl" -> "KL", "ew$" -> "EW"), matchMode = "regex")),
    "filter_string_complement" -> ((s, d) => events(s, d)
      .select(col("event_id"), col("event_type"))
      .filterString("event_type", "^(click|view)$", regex = true, complement = true)),
    // failures present ('u'-prefixed rows) → astype(errors="ignore") keeps the
    // ENTIRE column unchanged (change_type.py:19 all-or-nothing semantics)
    "change_type_keep_values" -> ((s, d) => events(s, d)
      .select(col("event_id"),
        when(col("event_id") % 3 === 0, concat(lit("u"), col("user_id").cast("string")))
          .otherwise(col("user_id").cast("string")).as("uid"))
      .changeType("uid", "bigint", ignoreException = "keep_values")),
    // every value castable → the column converts to the target dtype
    "change_type_keep_values_all_cast" -> ((s, d) => events(s, d)
      .select(col("event_id"), col("user_id").cast("string").as("uid"))
      .changeType("uid", "bigint", ignoreException = "keep_values")),
    "fill_empty" -> ((s, d) => events(s, d)
      .select(col("event_id"), when(col("value") < 2, col("value")).as("v"))
      .fillEmpty(Map("v" -> 0.0d))),
    "impute" -> ((s, d) => lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"),
        when(col("l_discount") > 0.03, col("l_quantity")).as("v"))
      .impute("v", statistic = Some("mean"))),
    "impute_median" -> ((s, d) => lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"),
        when(col("l_discount") > 0.03, col("l_quantity")).as("v"))
      .impute("v", statistic = Some("median"))),
    "encode_categorical_sort" -> ((s, d) => {
      val df = events(s, d).select("event_id", "event_type")
        .encodeCategoricalOrder("event_type", "sort")
      val order = operators.TypeOps.categoriesOf(df, "event_type").get
      df.addColumn("code", operators.GroupedOps.valueRank("event_type", order))
    }),
    "coalesce" -> ((s, d) => events(s, d)
      .select(col("event_id"),
        when(col("event_type") === "click", col("value")).as("c1"),
        when(col("event_type") === "view", col("value") * 2).as("c2"))
      .coalesceColumns(Seq("c1", "c2"), targetColumn = Some("merged"),
        defaultValue = Some(-1.0d))),
    "flag_nulls" -> ((s, d) => events(s, d)
      .select(col("event_id"),
        when(col("value") < 2, col("value")).as("v1"),
        when(col("value") > 19, col("value")).as("v2"))
      .flagNulls("any_null", Seq("v1", "v2"))),

    // ----- §2.8 types / encodings -----
    "change_type" -> ((s, d) => lineitem(s, d)
      .select("l_orderkey", "l_linenumber", "l_quantity")
      .changeType("l_quantity", "int")),
    "to_datetime" -> ((s, d) => lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"),
        date_format(col("l_shipdate"), "yyyy-MM-dd HH:mm:ss").as("ship_str"))
      .toDatetime("ship_str", Some("yyyy-MM-dd HH:mm:ss"))),
    "convert_excel_date" -> ((s, d) => lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"),
        (lit(30000L) + col("l_orderkey") % 10000).as("serial"))
      .convertExcelDate("serial")),
    "convert_matlab_date" -> ((s, d) => events(s, d)
      .select(col("event_id"), (lit(738000.0d) + col("event_id") % 100 + 0.5d).as("datenum"))
      .convertMatlabDate("datenum")),
    "convert_unix_date" -> ((s, d) => events(s, d)
      .select(col("event_id"), (lit(1700000000L) + col("event_id")).as("epoch"))
      .convertUnixDate("epoch")),
    "truncate_datetime" -> ((s, d) => events(s, d)
      .select("event_id", "ts").truncateDatetime("HOUR")
      .select(col("event_id"), date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_hour"))),
    "factorize_columns" -> ((s, d) => events(s, d)
      .select("event_id", "event_type")
      .factorizeColumns("event_type", "event_id")),
    // the deprecated-alias surface (reference label_encode -> factorize):
    // gated separately so the alias is certified, not assumed
    "label_encode" -> ((s, d) => events(s, d)
      .select("event_id", "event_type")
      .labelEncode("event_type", "event_id")),
    // accounting-style strings WITHOUT a currency sign: the reference's
    // accounting branch only strips commas/parens, so "$1.23" would raise
    // in pandas astype(float) (null here) — a faithful gate feeds it the
    // strings it actually accepts
    "currency_column_to_numeric" -> ((s, d) => orders(s, d)
      .select(col("o_orderkey"),
        when(col("o_orderkey") % 2 === 1,
          concat(lit(" ("), round(col("o_totalprice"), 2).cast("string"), lit(")")))
          .otherwise(round(col("o_totalprice"), 2).cast("string"))
          .as("amount"))
      .currencyColumnToNumeric("amount", cleaningStyle = Some("accounting"))),
    "round_to_fraction" -> ((s, d) => lineitem(s, d)
      .select("l_orderkey", "l_linenumber", "l_extendedprice")
      .roundToFraction("l_extendedprice", 4d)),
    "bin_numeric" -> ((s, d) => lineitem(s, d)
      .select("l_orderkey", "l_linenumber", "l_quantity")
      .binNumeric("l_quantity", "qty_bin", 0d, 50d, 10)),
    // pd.cut's labels kwarg (bin_numeric.py **kwargs; one label per bin)
    "bin_numeric_labels" -> ((s, d) => lineitem(s, d)
      .select("l_orderkey", "l_linenumber", "l_quantity")
      .binNumeric("l_quantity", "qty_label", 0d, 50d, 5,
        labels = Seq("q1", "q2", "q3", "q4", "q5"))),
    // pd.cut parity: data-derived edges, RIGHT-closed, lowest included
    // (empirically matched against the reference; TypeOps.binNumericCut)
    "bin_numeric_cut" -> ((s, d) => lineitem(s, d)
      .select("l_orderkey", "l_linenumber", "l_quantity")
      .binNumericCut("l_quantity", "qty_label", 5,
        labels = Seq("q1", "q2", "q3", "q4", "q5"))),
    "min_max_scale" -> ((s, d) => lineitem(s, d)
      .select("l_orderkey", "l_linenumber", "l_extendedprice")
      .minMaxScale("l_extendedprice", destColumn = Some("scaled"))
      .removeColumns("l_extendedprice")),
    "min_max_scale_jointly" -> ((s, d) => lineitem(s, d)
      .select("l_orderkey", "l_linenumber", "l_extendedprice", "l_quantity")
      .minMaxScaleColumns(Seq("l_extendedprice", "l_quantity"), jointly = true)),
    "encode_categorical" -> ((s, d) => events(s, d)
      .encodeCategorical("event_type", Seq("click", "view", "purchase", "signup", "error"))
      .toSetOf("event_type")),
    // registry inferred with order='sort' from the FULL frame, then one
    // category's rows are filtered away: names_expand must still materialize
    // the unseen-but-registered 'error' column (all null)
    "encode_categorical_expand" -> ((s, d) => events(s, d)
      .select("user_id", "event_type", "value")
      .encodeCategoricalOrder("event_type", "sort")
      .filterOn("event_type <> 'error'")
      .pivotWider(index = Seq("user_id"), namesFrom = "event_type",
        valuesFrom = "value", agg = "sum", namesExpand = true)
      .transformColumns(Seq("click", "purchase", "signup", "view"),
        c => round(c * 1e4).cast("long"))),
    // order='appearance': registry order is first-seen by event_id; surfaced
    // as a code column so the ordering itself is hash-checked
    "encode_categorical_appearance" -> ((s, d) => {
      val df = events(s, d).select("event_id", "event_type")
        .encodeCategoricalOrder("event_type", "appearance", orderCol = Some("event_id"))
      val order = operators.TypeOps.categoriesOf(df, "event_type").get
      df.addColumn("code", operators.GroupedOps.valueRank("event_type", order))
    }),

    // ----- §2.9 transforms -----
    "add_column_iterable" -> ((s, d) => events(s, d)
      .select("event_id", "user_id")
      .addColumnIterable("tag", Seq("a", "b", "c"), orderCol = "event_id",
        fillRemaining = true)),
    "case_when" -> ((s, d) => lineitem(s, d)
      .select("l_orderkey", "l_linenumber", "l_quantity")
      .caseWhenSql("qty_class", Seq(
        "l_quantity < 10" -> "low", "l_quantity < 30" -> "mid"), "high")),
    "find_replace" -> ((s, d) => events(s, d)
      .select("event_id", "event_type")
      .findReplace("event_type", Map("click" -> "c", "view" -> "v"))),
    "transform_column" -> ((s, d) => lineitem(s, d)
      .select("l_orderkey", "l_linenumber", "l_extendedprice")
      .transformColumn("l_extendedprice",
        c => round(log(c) * 1e6).cast("long"), Some("log_price"))
      .removeColumns("l_extendedprice")),
    "transform_columns_multi" -> ((s, d) => lineitem(s, d)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_discount")
      .transformColumns(Seq("l_quantity", "l_discount"),
        c => round(c * 2 * 1e4).cast("long"))),
    "unionize_categories" -> ((s, d) => {
      import s.implicits._
      val a = events(s, d).filterOn("event_type IN ('click', 'view')")
        .encodeCategoricalOrder("event_type", "sort")
      val b = events(s, d).filterOn("event_type IN ('purchase', 'signup')")
        .encodeCategoricalOrder("event_type", "sort")
      val unionized = operators.TypeOps.unionizeCategories(Seq(a, b), "event_type")
      // surface the merged registry (read back from the re-stamped frames)
      // as rows so the oracle can pin it
      operators.TypeOps.categoriesOf(unionized.head, "event_type").get
        .toDF("category")
    }),
    "process_text" -> ((s, d) => part(s, d)
      .select("p_partkey", "p_name")
      .processText("p_name", "upper")),
    // one projection through twelve distinct .str dispatch-table entries —
    // the breadth check for the method table (TextOps.strMethod)
    "process_text_methods" -> ((s, d) => {
      val partn = graft.operators.TextOps.strMethod(col("p_name"), "partition", Seq(" "))
      part(s, d).select(
        col("p_partkey"),
        graft.operators.TextOps.strMethod(col("p_name"), "len").as("n"),
        graft.operators.TextOps.strMethod(col("p_name"), "contains", Seq("gre")).as("has_gre"),
        graft.operators.TextOps.strMethod(col("p_name"), "extract", Seq("([a-z]+)")).as("first_word"),
        graft.operators.TextOps.strMethod(col("p_name"), "zfill", Seq(30)).as("z"),
        graft.operators.TextOps.strMethod(col("p_name"), "removeprefix", Seq("a")).as("noprefix"),
        graft.operators.TextOps.strMethod(col("p_name"), "slice", Seq(2, 5)).as("sl"),
        graft.operators.TextOps.strMethod(col("p_name"), "count", Seq(" ")).as("nsp"),
        graft.operators.TextOps.strMethod(col("p_name"), "cat", Seq("|", "X")).as("catx"),
        graft.operators.TextOps.strMethod(col("p_name"), "wrap", Seq(15)).as("wr"),
        graft.operators.TextOps.strMethod(
          concat(col("p_name"), lit("é")), "normalize", Seq("NFC")).as("nrm"),
        partn.getField("head").as("part_head"),
        partn.getField("tail").as("part_tail"),
        graft.operators.TextOps.strMethod(col("p_name"), "translate", Seq("aeiou", "AEIO")).as("tr"))
    }),
    // round-14 parity sweep (VERDICT r13 #6): the pd.Series.str methods
    // beyond the first gate — slice_replace/center/pad/findall/match/
    // fullmatch/rfind/rpartition/join/isdecimal/istitle + encode/decode
    // round-trip. istitle rides a parity mix (even rows title-cased) so
    // the gate carries both truth values on real data.
    "process_text_methods2" -> ((s, d) => {
      import graft.operators.TextOps.strMethod
      val rpart = strMethod(col("p_name"), "rpartition", Seq(" "))
      val mixed = when(col("p_partkey") % 2 === 0, initcap(col("p_name")))
        .otherwise(col("p_name"))
      part(s, d).select(
        col("p_partkey"),
        strMethod(col("p_name"), "slice_replace", Seq(2, 5, "X")).as("slrep"),
        strMethod(col("p_name"), "center", Seq(30, ".")).as("ctr"),
        strMethod(col("p_name"), "pad", Seq(28, "left", "_")).as("padl"),
        size(strMethod(col("p_name"), "findall", Seq("[aeiou]+"))).as("n_vowel_runs"),
        element_at(strMethod(col("p_name"), "findall", Seq("[aeiou]+")), 1)
          .as("first_vowel_run"),
        strMethod(col("p_name"), "match", Seq("[a-z]+ ")).as("m"),
        strMethod(col("p_name"), "fullmatch", Seq("[a-z ]+")).as("fm"),
        strMethod(col("p_name"), "rfind", Seq(" ")).as("rf"),
        rpart.getField("head").as("rp_head"),
        rpart.getField("tail").as("rp_tail"),
        strMethod(col("p_name"), "join", Seq("-")).as("joined"),
        strMethod(col("p_partkey").cast("string"), "isdecimal").as("isdec"),
        strMethod(mixed, "istitle").as("ist"),
        strMethod(strMethod(col("p_name"), "encode", Seq("UTF-8")),
          "decode", Seq("UTF-8")).as("rt"))
    }),
    "add_column" -> ((s, d) => orders(s, d)
      .select("o_orderkey", "o_totalprice")
      .addColumn("fee", col("o_totalprice") * 0.1d)
      .addColumn("tag", lit("x"))),
    "join_apply" -> ((s, d) => lineitem(s, d)
      .select("l_orderkey", "l_linenumber", "l_extendedprice", "l_discount")
      .joinApply(round(col("l_extendedprice") * (lit(1.0d) - col("l_discount")) * 1e6)
        .cast("long"), "net")),

    // ----- §2.10 math -----
    "math_sigmoid" -> ((s, d) => lineitem(s, d)
      .select("l_orderkey", "l_linenumber", "l_discount")
      .addColumn("sig", round(MathFunctions.sigmoid(col("l_discount")) * 1e10).cast("long"))),
    "math_logit" -> ((s, d) => lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"), (col("l_discount") + 0.01d).as("p"))
      .addColumn("lg", round(MathFunctions.logit(col("p")) * 1e10).cast("long"))),
    "math_zscore" -> ((s, d) => lineitem(s, d)
      .select("l_orderkey", "l_linenumber", "l_extendedprice")
      .zScoreOf("l_extendedprice", "z")
      .transformColumn("z", c => round(c * 1e6).cast("long"))
      .removeColumns("l_extendedprice")),
    "math_softmax" -> ((s, d) => lineitem(s, d)
      .select("l_orderkey", "l_linenumber", "l_discount")
      .softmaxOf("l_discount", "sm")
      .transformColumn("sm", c => round(c * 1e12).cast("long"))),
    "math_ecdf" -> ((s, d) => lineitem(s, d)
      .select("l_orderkey", "l_linenumber", "l_quantity")
      .ecdfOf("l_quantity", "p")),

    // ----- §2.12 timeseries -----
    "fill_missing_timestamps" -> ((s, d) => {
      val ev = events(s, d)
      val bounds = ev.agg(date_trunc("hour", min(col("ts"))).as("lo"),
        date_trunc("hour", max(col("ts"))).as("hi"))
      val hours = bounds.select(explode(expr("sequence(lo, hi, interval 1 hour)")).as("hour"))
      val counts = ev.groupBy(date_trunc("hour", col("ts")).as("hour"))
        .agg(count(lit(1)).as("n"))
      hours.join(counts, Seq("hour"), "left")
        .select(date_format(col("hour"), "yyyy-MM-dd HH:mm:ss").as("hour"),
          coalesce(col("n"), lit(0L)).as("n"))
    }),
    "sort_timestamps_monotonically" -> ((s, d) => events(s, d)
      .select("event_id", "ts", "user_id")
      .takeFirst(Seq("ts"), "event_id")
      .select(col("event_id"), date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("ts_str"), col("user_id"))),
    // gate runs the real operator (bucketed ScaleWindows.lag1 path), not an
    // inline global window — the green hash certifies the scale-safe plan
    "flag_jumps" -> ((s, d) => events(s, d).select("event_id", "value")
      .flagJumps("event_id",
        default = operators.TimeseriesOps.JumpCriteria("absolute", "any", 10.0))
      .withColumnRenamed("value_jump_flag", "jump")),
    // per-user inactivity-gap sessions (gap = 6h on this data ≈ 45% break
    // rate); (user_id, ts) is unique in the generator, so the keyed-window
    // order is total and the ids are deterministic
    "sessionize" -> ((s, d) =>
      operators.TimeseriesOps.sessionize(
        events(s, d).select("event_id", "user_id", "ts"),
        "user_id", "ts", gapSeconds = 21600L)
        .select("event_id", "user_id", "session_id")),
    "session_stats" -> ((s, d) =>
      operators.TimeseriesOps.sessionStats(
        events(s, d).select("user_id", "ts"),
        "user_id", "ts", gapSeconds = 21600L)
        .withColumn("duration_us", round(col("duration_sec") * 1e6).cast("long"))
        .drop("duration_sec")),
    // first-touch ordered funnel: view -> click -> purchase per user
    "funnel" -> ((s, d) =>
      operators.EventOps.funnel(events(s, d), "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))),
    "cohort_retention" -> ((s, d) =>
      operators.EventOps.cohortRetention(events(s, d), "user_id", "ts", "week")),
    // custom TypedImperativeAggregate: deterministic bottom-k-by-md5 group
    // sample with real partial aggregation (bounded k-heap per map task)
    "group_sample" -> ((s, d) =>
      operators.GroupedOps.groupSample(
        events(s, d).select(col("event_type"), col("event_id").cast("string").as("eid")),
        Seq("event_type"), "eid", k = 3)),
    // trailing 6h window per user; every float aggregate rides exact cents
    // (integer-only projection: the driver's hash canonicalizer diverges on
    // raw doubles even when DuckDB-local compares value-exact — VERDICT r10)
    "rolling_agg" -> ((s, d) =>
      operators.TimeseriesOps.rollingAgg(
        events(s, d).select("event_id", "user_id", "ts", "value"),
        "user_id", "ts", 21600L,
        Map(
          "roll_n" -> count(lit(1)),
          "roll_sum_cents" -> sum(round(col("value") * 100).cast("long")),
          "roll_max_cents" -> max(round(col("value") * 100).cast("long"))))
        .select("event_id", "user_id", "roll_n", "roll_sum_cents", "roll_max_cents")),
    // the skew-safe band-decomposed twin held to the SAME oracle: identical
    // window semantics from a completely different plan (SF1_SMOKE.md r11)
    "rolling_agg_banded" -> ((s, d) =>
      operators.TimeseriesOps.rollingAggBanded(
        events(s, d).select(col("event_id"), col("user_id"), col("ts"),
          round(col("value") * 100).cast("long").as("cents")),
        "event_id", "user_id", "ts", 21600L,
        Map("roll_n" -> ("cents", "count"),
          "roll_sum_cents" -> ("cents", "sum"),
          "roll_max_cents" -> ("cents", "max")))
        .select("event_id", "user_id", "roll_n", "roll_sum_cents", "roll_max_cents"))
  )

  val oracles: Map[String, String] = Map(
    // reference-default semantics: strip_underscores=None leaves the outer
    // underscore that '?' / ')' normalization produces (utils.py:757-774)
    "clean_names" ->
      """SELECT l_orderkey AS l_orderkey_, l_quantity AS quantity_units_, l_returnflag AS return_flag FROM lineitem""",
    "rename_column" ->
      """SELECT l_orderkey, l_linenumber, l_quantity AS qty FROM lineitem""",
    "rename_columns" ->
      """SELECT l_orderkey AS "L_ORDERKEY", l_linenumber AS "L_LINENUMBER", l_quantity AS "L_QUANTITY" FROM lineitem""",
    "limit_column_characters" ->
      """SELECT l_orderkey AS "l_ord", l_linenumber AS "l_lin", l_quantity AS "l_qua" FROM lineitem""",
    "collapse_levels" ->
      """SELECT value AS m_v, user_id AS m_u, event_id FROM events""",
    "select_columns" ->
      """SELECT l_orderkey, l_partkey, l_suppkey FROM lineitem""",
    "select_rows_labels" ->
      """SELECT * FROM nation WHERE n_nationkey IN (1, 5, 10)""",
    "expand_grid_frames" ->
      """SELECT r.r_regionkey AS r_r_regionkey, r.r_name AS r_r_name,
        |       n.n_nationkey AS n_n_nationkey, n.n_name AS n_n_name
        |FROM region r CROSS JOIN
        |  (SELECT * FROM nation WHERE n_nationkey < 3) n""".stripMargin,
    "select_rows_invert" ->
      """SELECT * FROM nation WHERE n_nationkey NOT IN (1, 5, 10)""",
    "select_rows_slice_step" ->
      """SELECT c_custkey, c_name, c_acctbal FROM (
        |  SELECT c_custkey, c_name, c_acctbal,
        |         row_number() OVER (ORDER BY c_custkey) AS rn
        |  FROM customer WHERE c_custkey BETWEEN 1 AND 120) t
        |WHERE (rn - 1) % 3 = 0""".stripMargin,
    "select_rows_date_prefix" ->
      """SELECT l_orderkey, l_linenumber, l_shipdate FROM lineitem
        |WHERE l_shipdate >= DATE '1996-03-01' AND l_shipdate < DATE '1996-04-01'""".stripMargin,
    "remove_columns" ->
      """SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity, l_extendedprice, l_discount, l_shipdate FROM lineitem""",
    "reorder_columns" ->
      """SELECT * FROM lineitem""",
    "move" ->
      """SELECT * FROM lineitem""",
    "move_seq" ->
      """SELECT * FROM lineitem""",
    "move_rows" ->
      """WITH pos AS (SELECT *, row_number() OVER (ORDER BY n_name) AS p FROM nation),
        |t AS (SELECT p FROM pos WHERE n_name = 'NATION_17'),
        |adj AS (SELECT pos.*, CASE WHEN n_name = 'NATION_3'
        |  THEN (SELECT p FROM t) + 0.5 + p * 1e-9 ELSE CAST(p AS DOUBLE) END AS np
        |  FROM pos)
        |SELECT n_nationkey, n_name, n_regionkey,
        |  CAST(row_number() OVER (ORDER BY np) - 1 AS BIGINT) AS row_pos
        |FROM adj""".stripMargin,
    "select_both" ->
      """SELECT n_nationkey, n_regionkey FROM nation
        |WHERE n_nationkey NOT IN (1, 5, 10)""".stripMargin,
    "change_types" ->
      """SELECT l_orderkey, l_linenumber,
        |CAST(l_quantity AS VARCHAR) AS l_quantity,
        |CAST(l_discount AS VARCHAR) AS l_discount FROM lineitem""".stripMargin,
    "collapse_glue" ->
      """SELECT value AS mXv, user_id AS mXu, event_id FROM events""",
    "collapse_levels_rows" ->
      """SELECT l_returnflag || '-' || l_linestatus AS index,
        |l_orderkey, l_linenumber, l_quantity FROM lineitem""".stripMargin,
    "explode_pattern" ->
      """SELECT event_id, user_id, value FROM events""",
    "drop_constant_columns" ->
      """SELECT *, CAST(NULL AS INTEGER) AS all_null FROM lineitem""",
    "drop_duplicate_columns" ->
      """SELECT l_orderkey, l_linenumber, l_discount AS q FROM lineitem""",
    "filter_string" ->
      """SELECT * FROM part WHERE regexp_matches(p_name, '^red')""",
    "filter_on" ->
      """SELECT * FROM lineitem WHERE l_quantity > 30 AND l_discount < 0.05""",
    "filter_date" ->
      """SELECT l_orderkey, l_linenumber, l_shipdate FROM lineitem
        |WHERE year(l_shipdate) = 1997 AND month(l_shipdate) IN (1,2,3)""".stripMargin,
    "filter_column_isin" ->
      """SELECT * FROM orders WHERE o_orderpriority IN ('1-URGENT','2-HIGH')""",
    "dropnotnull" ->
      """SELECT event_id, user_id, value, CAST(NULL AS DOUBLE) AS v FROM events WHERE value >= 2""",
    "remove_empty" ->
      """SELECT event_id, user_id FROM events""",
    "get_dupes" ->
      """SELECT l_orderkey, l_linenumber, l_partkey FROM lineitem
        |QUALIFY count(*) OVER (PARTITION BY l_partkey) > 1""".stripMargin,
    "update_where" ->
      """SELECT l_orderkey, l_linenumber, l_discount,
        |CASE WHEN l_discount > 0.05 THEN 1 END AS flag FROM lineitem""".stripMargin,
    "groupby_agg" ->
      """SELECT l_orderkey, l_linenumber, l_quantity,
        |sum(l_quantity) OVER (PARTITION BY l_orderkey) AS sum_qty FROM lineitem""".stripMargin,
    "groupby_agg_skew" ->
      """SELECT l_orderkey, l_linenumber, l_quantity,
        |sum(l_quantity) OVER (PARTITION BY l_orderkey) AS sum_qty FROM lineitem""".stripMargin,
    "groupby_agg_nunique" ->
      """SELECT l_orderkey, l_linenumber, l_returnflag,
        |count(DISTINCT l_returnflag) OVER (PARTITION BY l_orderkey) AS n_flags
        |FROM lineitem""".stripMargin,
    "groupby_agg_dropna" ->
      """SELECT l_orderkey, l_linenumber,
        |CASE WHEN l_returnflag <> 'N' THEN l_returnflag END AS flag, l_quantity,
        |CASE WHEN l_returnflag <> 'N' THEN
        |  sum(l_quantity) OVER (PARTITION BY CASE WHEN l_returnflag <> 'N' THEN l_returnflag END)
        |END AS sum_qty FROM lineitem""".stripMargin,
    "groupby_topk" ->
      """SELECT l_orderkey, l_linenumber, l_returnflag, l_extendedprice FROM lineitem
        |QUALIFY row_number() OVER (PARTITION BY l_returnflag
        |  ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) <= 3""".stripMargin,
    "groupby_topk_asc" ->
      """SELECT l_orderkey, l_linenumber, l_returnflag, l_extendedprice FROM lineitem
        |QUALIFY row_number() OVER (PARTITION BY l_returnflag
        |  ORDER BY l_extendedprice ASC, l_orderkey ASC, l_linenumber ASC) <= 3""".stripMargin,
    "groupby_topk_salted" ->
      """SELECT l_orderkey, l_linenumber, l_returnflag, l_extendedprice FROM lineitem
        |QUALIFY row_number() OVER (PARTITION BY l_returnflag
        |  ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) <= 3""".stripMargin,
    "take_first" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_shipdate FROM lineitem
        |QUALIFY row_number() OVER (PARTITION BY l_partkey
        |  ORDER BY l_shipdate, l_orderkey, l_linenumber) = 1""".stripMargin,
    "count_cumulative_unique" ->
      """SELECT event_id, user_id,
        |CAST(sum(f) OVER (ORDER BY event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_unique
        |FROM (SELECT event_id, user_id,
        |  CASE WHEN row_number() OVER (PARTITION BY user_id ORDER BY event_id) = 1 THEN 1 ELSE 0 END AS f
        |  FROM events)""".stripMargin,
    "count_cumulative_unique_ci" ->
      """WITH e AS (SELECT event_id,
        |  CASE WHEN event_id % 2 = 0 THEN upper(event_type) ELSE event_type END AS etype
        |  FROM events)
        |SELECT event_id, etype,
        |CAST(sum(f) OVER (ORDER BY event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_unique
        |FROM (SELECT event_id, etype,
        |  CASE WHEN row_number() OVER (PARTITION BY lower(etype) ORDER BY event_id) = 1 THEN 1 ELSE 0 END AS f
        |  FROM e)""".stripMargin,
    "shuffle" ->
      """SELECT event_id, user_id, value FROM events""",
    "sort_naturally" ->
      """SELECT 'p' || p_partkey AS tag FROM part ORDER BY p_partkey LIMIT 20""",
    "sort_column_value_order" ->
      """SELECT event_id, event_type,
        |CASE event_type WHEN 'signup' THEN 0 WHEN 'click' THEN 1 WHEN 'view' THEN 2
        |  WHEN 'purchase' THEN 3 WHEN 'error' THEN 4 ELSE 5 END AS type_rank
        |FROM events""".stripMargin,
    "toset" ->
      """SELECT DISTINCT l_returnflag FROM lineitem""",
    "fill_direction" ->
      """SELECT event_id, event_type,
        |last_value(v IGNORE NULLS) OVER (ORDER BY event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v
        |FROM (SELECT event_id, event_type,
        |  CASE WHEN event_type = 'click' THEN value END AS v FROM events)""".stripMargin,
    "filter_date_range" ->
      """SELECT l_orderkey, l_linenumber, l_shipdate FROM lineitem
        |WHERE CAST(l_shipdate AS TIMESTAMP) >= TIMESTAMP '1997-06-01'
        |  AND CAST(l_shipdate AS TIMESTAMP) <= TIMESTAMP '1997-08-31'""".stripMargin,
    "fill_direction_downup" ->
      """SELECT event_id, event_type,
        |coalesce(
        |  last_value(v IGNORE NULLS) OVER (ORDER BY event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |  first_value(v IGNORE NULLS) OVER (ORDER BY event_id ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)) AS v
        |FROM (SELECT event_id, event_type,
        |  CASE WHEN event_type = 'click' THEN value END AS v FROM events)""".stripMargin,
    "fill_direction_grouped" ->
      """SELECT event_id, event_type,
        |last_value(v IGNORE NULLS) OVER (PARTITION BY event_type ORDER BY event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v
        |FROM (SELECT event_id, event_type,
        |  CASE WHEN value >= 1 THEN value END AS v FROM events)""".stripMargin,
    // anchored patterns: Spark's regexp_replace replaces every match, DuckDB
    // only the first without the 'g' flag — anchors make both a single match
    "find_replace_regex" ->
      """SELECT event_id,
        |CASE WHEN regexp_matches(event_type, '^cl') THEN 'KL'
        |     WHEN regexp_matches(event_type, 'ew$') THEN 'EW'
        |     ELSE event_type END AS event_type
        |FROM events""".stripMargin,
    "filter_string_complement" ->
      """SELECT event_id, event_type FROM events
        |WHERE NOT regexp_matches(event_type, '^(click|view)$')""".stripMargin,
    // all-or-nothing astype: failures exist, so the column passes through unchanged
    "change_type_keep_values" ->
      """SELECT event_id,
        |  CASE WHEN event_id % 3 = 0 THEN 'u' || CAST(user_id AS VARCHAR)
        |       ELSE CAST(user_id AS VARCHAR) END AS uid FROM events""".stripMargin,
    "change_type_keep_values_all_cast" ->
      """SELECT event_id, CAST(CAST(user_id AS VARCHAR) AS BIGINT) AS uid
        |FROM events""".stripMargin,
    "fill_empty" ->
      """SELECT event_id, coalesce(CASE WHEN value < 2 THEN value END, 0.0) AS v FROM events""",
    "impute" ->
      """WITH t AS (SELECT l_orderkey, l_linenumber,
        |  CASE WHEN l_discount > 0.03 THEN l_quantity END AS v FROM lineitem)
        |SELECT l_orderkey, l_linenumber, coalesce(v, (SELECT avg(v) FROM t)) AS v FROM t""".stripMargin,
    "coalesce" ->
      """SELECT event_id,
        |  CASE WHEN event_type = 'click' THEN value END AS c1,
        |  CASE WHEN event_type = 'view' THEN value * 2 END AS c2,
        |  coalesce(
        |  CASE WHEN event_type = 'click' THEN value END,
        |  CASE WHEN event_type = 'view' THEN value * 2 END,
        |  -1.0) AS merged FROM events""".stripMargin,
    "flag_nulls" ->
      """SELECT event_id,
        |CASE WHEN value < 2 THEN value END AS v1,
        |CASE WHEN value > 19 THEN value END AS v2,
        |CASE WHEN (CASE WHEN value < 2 THEN value END) IS NULL
        |  OR (CASE WHEN value > 19 THEN value END) IS NULL THEN 1 ELSE 0 END AS any_null
        |FROM events""".stripMargin,
    "change_type" ->
      """SELECT l_orderkey, l_linenumber, CAST(l_quantity AS INTEGER) AS l_quantity FROM lineitem""",
    "to_datetime" ->
      """SELECT l_orderkey, l_linenumber,
        |strptime(strftime(l_shipdate, '%Y-%m-%d %H:%M:%S'), '%Y-%m-%d %H:%M:%S') AS ship_str
        |FROM lineitem""".stripMargin,
    "convert_excel_date" ->
      """SELECT l_orderkey, l_linenumber,
        |TIMESTAMP '1899-12-30 00:00:00' + (30000 + l_orderkey % 10000) * INTERVAL '1 day' AS serial
        |FROM lineitem""".stripMargin,
    "convert_matlab_date" ->
      """SELECT event_id,
        |make_timestamp(CAST(round((738000.0 + event_id % 100 + 0.5 - 719529) * 86400 * 1e6) AS BIGINT)) AS datenum
        |FROM events""".stripMargin,
    "convert_unix_date" ->
      """SELECT event_id,
        |TIMESTAMP '1970-01-01 00:00:00' + (1700000000 + event_id) * INTERVAL '1 second' AS epoch
        |FROM events""".stripMargin,
    "truncate_datetime" ->
      """SELECT event_id, strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS ts_hour FROM events""",
    "factorize_columns" ->
      """WITH f AS (SELECT event_type AS v, min(event_id) AS first_seen FROM events GROUP BY 1),
        |c AS (SELECT v, CAST(row_number() OVER (ORDER BY first_seen) - 1 AS INTEGER) AS code FROM f)
        |SELECT e.event_id, e.event_type, c.code AS event_type_enc
        |FROM events e JOIN c ON e.event_type = c.v""".stripMargin,
    "label_encode" ->
      """WITH f AS (SELECT event_type AS v, min(event_id) AS first_seen FROM events GROUP BY 1),
        |c AS (SELECT v, CAST(row_number() OVER (ORDER BY first_seen) - 1 AS INTEGER) AS code FROM f)
        |SELECT e.event_id, e.event_type, c.code AS event_type_enc
        |FROM events e JOIN c ON e.event_type = c.v""".stripMargin,
    "currency_column_to_numeric" ->
      """SELECT o_orderkey,
        |CASE WHEN o_orderkey % 2 = 1 THEN -round(o_totalprice, 2) ELSE round(o_totalprice, 2) END AS amount
        |FROM orders""".stripMargin,
    "round_to_fraction" ->
      """SELECT l_orderkey, l_linenumber, round(l_extendedprice * 4) / 4 AS l_extendedprice FROM lineitem""",
    "bin_numeric" ->
      """SELECT l_orderkey, l_linenumber, l_quantity,
        |CASE WHEN l_quantity < 0 OR l_quantity > 50 THEN NULL ELSE
        |  CAST(least(greatest(ceil((l_quantity - 0.0) / 5.0) - 1, 0), 9) AS INTEGER)
        |END AS qty_bin
        |FROM lineitem""".stripMargin,
    "bin_numeric_labels" ->
      """SELECT l_orderkey, l_linenumber, l_quantity,
        |CASE WHEN l_quantity < 0 OR l_quantity > 50 THEN NULL ELSE
        |  (['q1','q2','q3','q4','q5'])[CAST(least(greatest(ceil((l_quantity - 0.0) / 10.0) - 1, 0), 4) AS INTEGER) + 1]
        |END AS qty_label
        |FROM lineitem""".stripMargin,
    "bin_numeric_cut" ->
      """WITH m AS (SELECT CAST(min(l_quantity) AS DOUBLE) AS mn,
        |  (CAST(max(l_quantity) AS DOUBLE) - CAST(min(l_quantity) AS DOUBLE)) / 5.0 AS w
        |  FROM lineitem)
        |SELECT l_orderkey, l_linenumber, l_quantity,
        |(['q1','q2','q3','q4','q5'])[CAST(least(greatest(ceil((l_quantity - m.mn) / m.w) - 1, 0), 4) AS INTEGER) + 1] AS qty_label
        |FROM lineitem, m""".stripMargin,
    "min_max_scale" ->
      """WITH m AS (SELECT CAST(min(l_extendedprice) AS DOUBLE) AS mn,
        |  CAST(max(l_extendedprice) AS DOUBLE) AS mx FROM lineitem)
        |SELECT l_orderkey, l_linenumber,
        |  (l_extendedprice - m.mn) * (1.0 / (m.mx - m.mn)) + 0.0 AS scaled
        |FROM lineitem, m""".stripMargin,
    "min_max_scale_jointly" ->
      """WITH m AS (SELECT
        |  least(CAST(min(l_extendedprice) AS DOUBLE), CAST(min(l_quantity) AS DOUBLE)) AS mn,
        |  greatest(CAST(max(l_extendedprice) AS DOUBLE), CAST(max(l_quantity) AS DOUBLE)) AS mx
        |  FROM lineitem)
        |SELECT l_orderkey, l_linenumber,
        |  (l_extendedprice - m.mn) * (1.0 / (m.mx - m.mn)) + 0.0 AS l_extendedprice,
        |  (l_quantity - m.mn) * (1.0 / (m.mx - m.mn)) + 0.0 AS l_quantity
        |FROM lineitem, m""".stripMargin,
    "encode_categorical" ->
      """SELECT DISTINCT event_type FROM events""",
    "encode_categorical_expand" ->
      """SELECT user_id,
        |CAST(round(sum(CASE WHEN event_type = 'click' THEN value END) * 1e4) AS BIGINT) AS click,
        |CAST(NULL AS DOUBLE) AS error,
        |CAST(round(sum(CASE WHEN event_type = 'purchase' THEN value END) * 1e4) AS BIGINT) AS purchase,
        |CAST(round(sum(CASE WHEN event_type = 'signup' THEN value END) * 1e4) AS BIGINT) AS signup,
        |CAST(round(sum(CASE WHEN event_type = 'view' THEN value END) * 1e4) AS BIGINT) AS "view"
        |FROM events WHERE event_type <> 'error' GROUP BY user_id""".stripMargin,
    "encode_categorical_appearance" ->
      """WITH f AS (SELECT event_type, min(event_id) AS fe FROM events GROUP BY 1)
        |SELECT e.event_id, e.event_type,
        |CAST((SELECT count(*) FROM f f2 WHERE f2.fe < f.fe) AS INTEGER) AS code
        |FROM events e JOIN f ON e.event_type = f.event_type""".stripMargin,
    "encode_categorical_sort" ->
      """WITH c AS (SELECT DISTINCT event_type FROM events WHERE event_type IS NOT NULL)
        |SELECT e.event_id, e.event_type,
        |CAST((SELECT count(*) FROM c c2 WHERE c2.event_type < e.event_type) AS INTEGER) AS code
        |FROM events e""".stripMargin,
    "impute_median" ->
      """WITH t AS (SELECT l_orderkey, l_linenumber,
        |  CASE WHEN l_discount > 0.03 THEN l_quantity END AS v FROM lineitem)
        |SELECT l_orderkey, l_linenumber, coalesce(v, (SELECT median(v) FROM t)) AS v FROM t""".stripMargin,
    "transform_columns_multi" ->
      """SELECT l_orderkey, l_linenumber,
        |CAST(round(l_quantity * 2 * 1e4) AS BIGINT) AS l_quantity,
        |CAST(round(l_discount * 2 * 1e4) AS BIGINT) AS l_discount FROM lineitem""".stripMargin,
    "unionize_categories" ->
      """SELECT DISTINCT event_type AS category FROM events
        |WHERE event_type IN ('click', 'view', 'purchase', 'signup')""".stripMargin,
    "add_column_iterable" ->
      """SELECT event_id, user_id,
        |CASE (row_number() OVER (ORDER BY event_id) - 1) % 3
        |  WHEN 0 THEN 'a' WHEN 1 THEN 'b' ELSE 'c' END AS tag
        |FROM events""".stripMargin,
    "case_when" ->
      """SELECT l_orderkey, l_linenumber, l_quantity,
        |CASE WHEN l_quantity < 10 THEN 'low' WHEN l_quantity < 30 THEN 'mid' ELSE 'high' END AS qty_class
        |FROM lineitem""".stripMargin,
    "find_replace" ->
      """SELECT event_id,
        |CASE event_type WHEN 'click' THEN 'c' WHEN 'view' THEN 'v' ELSE event_type END AS event_type
        |FROM events""".stripMargin,
    "transform_column" ->
      """SELECT l_orderkey, l_linenumber,
        |CAST(round(ln(l_extendedprice) * 1e6) AS BIGINT) AS log_price FROM lineitem""".stripMargin,
    "process_text" ->
      """SELECT p_partkey, upper(p_name) AS p_name FROM part""",
    "process_text_methods" ->
      """SELECT p_partkey,
        |length(p_name) AS n,
        |contains(p_name, 'gre') AS has_gre,
        |regexp_extract(p_name, '([a-z]+)', 1) AS first_word,
        |CASE WHEN length(p_name) >= 30 THEN p_name
        |  ELSE lpad(p_name, 30, '0') END AS z,
        |CASE WHEN starts_with(p_name, 'a') THEN substr(p_name, 2) ELSE p_name END AS noprefix,
        |substr(p_name, 3, 3) AS sl,
        |len(string_split(p_name, ' ')) - 1 AS nsp,
        |p_name || '|' || 'X' AS catx,
        |rtrim(regexp_replace(p_name, '(.{1,15})( +|$)', '\1' || chr(10), 'g'), chr(10)) AS wr,
        |nfc_normalize(p_name || 'e' || chr(769)) AS nrm,
        |CASE WHEN instr(p_name, ' ') > 0 THEN substr(p_name, 1, instr(p_name, ' ') - 1)
        |  ELSE p_name END AS part_head,
        |CASE WHEN instr(p_name, ' ') > 0 THEN substr(p_name, instr(p_name, ' ') + 1)
        |  ELSE '' END AS part_tail,
        |translate(p_name, 'aeiou', 'AEIO') AS tr
        |FROM part""".stripMargin,
    "process_text_methods2" ->
      """WITH b AS (SELECT p_partkey, p_name,
        |  CASE WHEN p_partkey % 2 = 0 THEN array_to_string(
        |      list_transform(string_split(p_name, ' '),
        |        w -> upper(substr(w, 1, 1)) || substr(w, 2)), ' ')
        |    ELSE p_name END AS mixed,
        |  strpos(reverse(p_name), ' ') AS rpos FROM part)
        |SELECT p_partkey,
        |  substr(p_name, 1, 2) || 'X' || substr(p_name, 6) AS slrep,
        |  CASE WHEN length(p_name) >= 30 THEN p_name
        |    ELSE rpad(lpad(p_name, CAST((30 + length(p_name)) // 2 AS INT), '.'), 30, '.') END AS ctr,
        |  CASE WHEN length(p_name) >= 28 THEN p_name
        |    ELSE lpad(p_name, 28, '_') END AS padl,
        |  len(regexp_extract_all(p_name, '[aeiou]+')) AS n_vowel_runs,
        |  regexp_extract_all(p_name, '[aeiou]+')[1] AS first_vowel_run,
        |  regexp_matches(p_name, '^(?:[a-z]+ )') AS m,
        |  regexp_matches(p_name, '^(?:[a-z ]+)$') AS fm,
        |  CASE WHEN rpos > 0 THEN length(p_name) - (rpos - 1) - 1 ELSE -1 END AS rf,
        |  CASE WHEN rpos > 0 THEN substr(p_name, 1, length(p_name) - (rpos - 1) - 1) ELSE '' END AS rp_head,
        |  CASE WHEN rpos > 0 THEN substr(p_name, length(p_name) - (rpos - 1) + 1) ELSE p_name END AS rp_tail,
        |  array_to_string(regexp_extract_all(p_name, '.'), '-') AS joined,
        |  regexp_matches(CAST(p_partkey AS VARCHAR), '^[0-9]+$') AS isdec,
        |  (regexp_matches(mixed, '[A-Za-z]') AND NOT regexp_matches(mixed, '[^ ][A-Z]')
        |   AND NOT regexp_matches(mixed, '(^| )[a-z]')) AS ist,
        |  p_name AS rt
        |FROM b""".stripMargin,
    "add_column" ->
      """SELECT o_orderkey, o_totalprice, o_totalprice * 0.1 AS fee, 'x' AS tag FROM orders""",
    "join_apply" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice, l_discount,
        |CAST(round(l_extendedprice * (1.0 - l_discount) * 1e6) AS BIGINT) AS net
        |FROM lineitem""".stripMargin,
    "math_sigmoid" ->
      """SELECT l_orderkey, l_linenumber, l_discount,
        |CAST(round(1.0 / (1.0 + exp(-l_discount)) * 1e10) AS BIGINT) AS sig
        |FROM lineitem""".stripMargin,
    "math_logit" ->
      """SELECT l_orderkey, l_linenumber, l_discount + 0.01 AS p,
        |CAST(round(ln((l_discount + 0.01) / (1.0 - (l_discount + 0.01))) * 1e10) AS BIGINT) AS lg
        |FROM lineitem""".stripMargin,
    "math_zscore" ->
      """WITH m AS (SELECT avg(l_extendedprice) AS mu, stddev_samp(l_extendedprice) AS sd FROM lineitem)
        |SELECT l_orderkey, l_linenumber,
        |CAST(round((l_extendedprice - m.mu) / m.sd * 1e6) AS BIGINT) AS z
        |FROM lineitem, m""".stripMargin,
    "math_softmax" ->
      """WITH m AS (SELECT max(l_discount) AS mx FROM lineitem),
        |s AS (SELECT sum(exp(l_discount - m.mx)) AS denom FROM lineitem, m)
        |SELECT l_orderkey, l_linenumber, l_discount,
        |CAST(round(exp(l_discount - m.mx) / s.denom * 1e12) AS BIGINT) AS sm
        |FROM lineitem, m, s""".stripMargin,
    "math_ecdf" ->
      """SELECT l_orderkey, l_linenumber, l_quantity,
        |cume_dist() OVER (ORDER BY l_quantity) AS p FROM lineitem""".stripMargin,
    "fill_missing_timestamps" ->
      """WITH b AS (SELECT date_trunc('hour', min(ts)) AS lo, date_trunc('hour', max(ts)) AS hi FROM events),
        |hours AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour FROM b),
        |c AS (SELECT date_trunc('hour', ts) AS hour, count(*) AS n FROM events GROUP BY 1)
        |SELECT strftime(hours.hour, '%Y-%m-%d %H:%M:%S') AS hour, coalesce(c.n, 0) AS n
        |FROM hours LEFT JOIN c ON hours.hour = c.hour""".stripMargin,
    "sort_timestamps_monotonically" ->
      """SELECT event_id, strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_str, user_id FROM events
        |QUALIFY row_number() OVER (PARTITION BY ts ORDER BY event_id) = 1""".stripMargin,
    "flag_jumps" ->
      """SELECT event_id, value,
        |CASE WHEN abs(value - lag(value) OVER (ORDER BY event_id)) > 10 THEN 1 ELSE 0 END AS jump
        |FROM events""".stripMargin,
    "sessionize" ->
      """WITH l AS (SELECT event_id, user_id, ts,
        |    CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
        |        OVER (PARTITION BY user_id ORDER BY ts) > 21600000000
        |      THEN 1 ELSE 0 END AS brk
        |  FROM events)
        |SELECT event_id, user_id,
        |  CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        |FROM l""".stripMargin,
    "session_stats" ->
      """WITH l AS (SELECT user_id, ts,
        |    CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
        |        OVER (PARTITION BY user_id ORDER BY ts) > 21600000000
        |      THEN 1 ELSE 0 END AS brk
        |  FROM events),
        |s AS (SELECT user_id, ts,
        |    CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        |  FROM l)
        |SELECT user_id, session_id, min(ts) AS session_start,
        |  max(ts) AS session_end, count(*) AS n_events,
        |  CAST(epoch_us(max(ts)) - epoch_us(min(ts)) AS BIGINT) AS duration_us
        |FROM s GROUP BY user_id, session_id""".stripMargin,
    "funnel" ->
      """WITH keys AS (SELECT DISTINCT user_id FROM events),
        |s0 AS (SELECT user_id, min(ts) AS view_ts FROM events
        |  WHERE event_type = 'view' GROUP BY user_id),
        |s1 AS (SELECT e.user_id, min(ts) AS click_ts FROM events e
        |  JOIN s0 USING (user_id)
        |  WHERE event_type = 'click' AND ts > view_ts GROUP BY e.user_id),
        |s2 AS (SELECT e.user_id, min(ts) AS purchase_ts FROM events e
        |  JOIN s1 USING (user_id)
        |  WHERE event_type = 'purchase' AND ts > click_ts GROUP BY e.user_id)
        |SELECT k.user_id, view_ts, click_ts, purchase_ts,
        |  CAST(CASE WHEN view_ts IS NULL THEN 0 ELSE 1 END +
        |       CASE WHEN click_ts IS NULL THEN 0 ELSE 1 END +
        |       CASE WHEN purchase_ts IS NULL THEN 0 ELSE 1 END AS BIGINT) AS stage
        |FROM keys k LEFT JOIN s0 USING (user_id)
        |  LEFT JOIN s1 USING (user_id) LEFT JOIN s2 USING (user_id)""".stripMargin,
    "cohort_retention" ->
      """WITH b AS (SELECT user_id, date_trunc('week', ts) AS b FROM events),
        |c AS (SELECT user_id, min(b) AS cohort FROM b GROUP BY user_id)
        |SELECT cohort,
        |  CAST((epoch_us(b.b) - epoch_us(cohort)) // 604800000000 AS BIGINT)
        |    AS period_offset,
        |  count(DISTINCT b.user_id) AS n_active
        |FROM b JOIN c USING (user_id) GROUP BY 1, 2""".stripMargin,
    "group_sample" ->
      """WITH h AS (SELECT event_type, CAST(event_id AS VARCHAR) AS v FROM events),
        |r AS (SELECT event_type, v,
        |    row_number() OVER (PARTITION BY event_type ORDER BY md5(v)) AS rn
        |  FROM h)
        |SELECT event_type, CAST(rn - 1 AS INT) AS pos, v AS sampled
        |FROM r WHERE rn <= 3""".stripMargin,
    // explicit self-join, no RANGE frame: window-frame semantics over
    // expressions are the one spot DuckDB versions could drift; BETWEEN on
    // BIGINT microseconds is version-proof, and integer-cents outputs are
    // canonicalizer-proof (VERDICT r10 #1). Fine at gate scale (10k events).
    "rolling_agg" ->
      """SELECT a.event_id, a.user_id,
        |  count(*) AS roll_n,
        |  CAST(sum(CAST(round(b.value * 100) AS BIGINT)) AS BIGINT) AS roll_sum_cents,
        |  max(CAST(round(b.value * 100) AS BIGINT)) AS roll_max_cents
        |FROM events a JOIN events b
        |  ON b.user_id = a.user_id
        |  AND epoch_us(b.ts) BETWEEN epoch_us(a.ts) - 21599999999
        |                         AND epoch_us(a.ts)
        |GROUP BY a.event_id, a.user_id""".stripMargin,
    // same oracle text as rolling_agg: the banded operator must reproduce
    // the keyed-window semantics exactly from its (key, band) plan
    "rolling_agg_banded" ->
      """SELECT a.event_id, a.user_id,
        |  count(*) AS roll_n,
        |  CAST(sum(CAST(round(b.value * 100) AS BIGINT)) AS BIGINT) AS roll_sum_cents,
        |  max(CAST(round(b.value * 100) AS BIGINT)) AS roll_max_cents
        |FROM events a JOIN events b
        |  ON b.user_id = a.user_id
        |  AND epoch_us(b.ts) BETWEEN epoch_us(a.ts) - 21599999999
        |                         AND epoch_us(a.ts)
        |GROUP BY a.event_id, a.user_id""".stripMargin
  )
}
