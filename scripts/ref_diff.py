#!/usr/bin/env python3
"""Differential fidelity gate: execute the REFERENCE implementation on the
same parquet testdata each gate reads, and diff against the engine's Verify
output parquet. This closes the loop the DuckDB oracle cannot — the oracle
encodes OUR reading of the contract; this harness runs the reference's own
code (shimmed optional deps in scripts/pyshim) on identical inputs, with the
EXACT per-gate prep each Spark query applies.

Usage:
  PYTHONPATH=scripts/pyshim:/root/reference \
      python3 scripts/ref_diff.py <sfDir> <verifyOutDir>

Only gates whose prep is 1:1 expressible in pandas are mapped; the rest are
covered by the DuckDB gate + golden specs. Documented divergences are
emulated where they are deliberate (take_first's deterministic tiebreak in
place of pandas' positional tie order).
"""
import sys

import numpy as np
import pandas as pd
import janitor  # noqa: F401  (registers the reference verbs)
import janitor.ml  # noqa: F401  (get_features_targets)
import janitor.timeseries  # noqa: F401  (sort_timestamps_monotonically)
import janitor.biology  # noqa: F401  (join_fasta, via the Bio shim)
from janitor.io import read_csvs, read_commandline


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df.columns = [str(c) for c in df.columns]
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
        elif df[c].dtype == object or str(df[c].dtype) == "category":
            df[c] = df[c].where(df[c].notna(), "\u2205").astype(str)
        elif str(df[c].dtype).startswith(("int", "Int", "uint", "float", "bool")):
            df[c] = df[c].astype("float64").round(6)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]

    def t(name):
        return pd.read_parquet(f"{sf_dir}/{name}.parquet")

    lineitem, orders, nation = t("lineitem"), t("orders"), t("nation")
    part = t("part")
    events = t("events")
    def li3():
        return lineitem[["l_orderkey", "l_linenumber", "l_quantity"]].copy()

    def with_v_qty():
        # impute gates: v = l_quantity where l_discount > 0.03
        d = lineitem[["l_orderkey", "l_linenumber"]].copy()
        d["v"] = lineitem.l_quantity.where(lineitem.l_discount > 0.03)
        return d

    cases = {
        # clean_names gate: dirty labels, default args
        "clean_names": lambda: lineitem.assign().rename(columns={})[
            ["l_orderkey", "l_quantity", "l_returnflag"]
        ].set_axis(["L OrderKey?", "Quantity (Units)", "Return-Flag"], axis=1)
            .clean_names(),
        # remove_empty gate: the all-null neg column AND no all-null rows
        "remove_empty": lambda: events[["event_id", "user_id"]]
            .assign(neg=events.value.where(events.value < 0)).remove_empty(),
        "dropnotnull": lambda: events[["event_id", "user_id", "value"]]
            .assign(v=events.value.where(events.value < 2)).dropnotnull("v"),
        "get_dupes": lambda: lineitem[["l_orderkey", "l_linenumber", "l_partkey"]]
            .get_dupes(column_names=["l_partkey"]),
        "fill_empty": lambda: events[["event_id"]]
            .assign(v=events.value.where(events.value < 2))
            .fill_empty(column_names="v", value=0.0),
        "impute": lambda: with_v_qty().impute("v", statistic_column_name="mean"),
        "impute_median": lambda: with_v_qty().impute(
            "v", statistic_column_name="median"),
        "coalesce": lambda: events[["event_id"]]
            .assign(c1=events.value.where(events.event_type == "click"),
                    c2=(events.value * 2).where(events.event_type == "view"))
            .coalesce("c1", "c2", target_column_name="merged", default_value=-1.0),
        "flag_nulls": lambda: events[["event_id"]]
            .assign(v1=events.value.where(events.value < 2),
                    v2=events.value.where(events.value > 19))
            .flag_nulls(column_name="any_null", columns=["v1", "v2"]),
        "factorize_columns": lambda: events[["event_id", "event_type"]]
            .sort_values("event_id").factorize_columns(column_names="event_type"),
        "groupby_agg": lambda: li3().groupby_agg(
            by="l_orderkey", agg="sum", agg_column_name="l_quantity",
            new_column_name="sum_qty"),
        # take_first: ours breaks l_shipdate ties with (l_orderkey,
        # l_linenumber) — pandas keeps whichever tied row sorts first in its
        # (unstable) internal sort, so the PAYLOAD of tied rows is the
        # documented divergence (SURVEY §7.7). Compare the value-determined
        # part: the kept (l_partkey, l_shipdate) pairs are identical.
        "take_first": lambda: lineitem[["l_partkey", "l_shipdate"]]
            .take_first(subset=["l_partkey"], by="l_shipdate"),
        "min_max_scale": lambda: _mms(),
        "round_to_fraction": lambda: lineitem[
            ["l_orderkey", "l_linenumber", "l_extendedprice"]
        ].round_to_fraction(column_name="l_extendedprice", denominator=4),
        "currency_column_to_numeric": lambda: _currency(),
        "bin_numeric_cut": lambda: li3().bin_numeric(
            from_column_name="l_quantity", to_column_name="qty_label", bins=5,
            labels=["q1", "q2", "q3", "q4", "q5"]),
        "limit_column_characters": lambda: li3().limit_column_characters(5),
        "concatenate_columns": lambda: nation.copy().concatenate_columns(
            column_names=["n_name", "n_regionkey"], new_column_name="combined",
            sep="-"),
        "find_replace": lambda: events[["event_id", "event_type"]]
            .find_replace(event_type={"click": "c", "view": "v"}),
        "drop_constant_columns": lambda: lineitem
            .assign(const_col=1, all_null=pd.Series(dtype="float64"))
            .drop_constant_columns(),
        # ---- batch 2 ----
        "rename_column": lambda: li3().rename_column("l_quantity", "qty"),
        "rename_columns": lambda: li3().rename_columns(function=str.upper),
        "remove_columns": lambda: lineitem.remove_columns(
            ["l_tax", "l_returnflag", "l_linestatus"]),
        "reorder_columns": lambda: lineitem.reorder_columns(
            ["l_quantity", "l_orderkey"]),
        "move": lambda: lineitem.move(source="l_quantity", target="l_orderkey",
                                      position="before", axis=1),
        "filter_string": lambda: part.filter_string(
            column_name="p_name", search_string="^red"),
        "filter_on": lambda: lineitem.filter_on(
            "l_quantity > 30 and l_discount < 0.05"),
        "filter_date": lambda: lineitem[
            ["l_orderkey", "l_linenumber", "l_shipdate"]
        ].filter_date(column_name="l_shipdate", years=[1997], months=[1, 2, 3]),
        "filter_column_isin": lambda: orders.filter_column_isin(
            column_name="o_orderpriority", iterable=["1-URGENT", "2-HIGH"]),
        "update_where": lambda: lineitem[
            ["l_orderkey", "l_linenumber", "l_discount"]
        ].update_where("l_discount > 0.05", "flag", 1),
        "case_when": lambda: li3().case_when(
            "l_quantity < 10", "low", "l_quantity < 30", "mid", "high",
            column_name="qty_class"),
        "count_cumulative_unique": lambda: events[["event_id", "user_id"]]
            .sort_values("event_id").count_cumulative_unique(
                column_name="user_id", dest_column_name="cum_unique"),
        # groupby_topk ties break positionally in pandas vs our deterministic
        # tiebreak — compare the value-determined columns only
        "groupby_topk": lambda: lineitem[["l_returnflag", "l_extendedprice"]]
            .groupby_topk("l_returnflag", "l_extendedprice", 3, ascending=False,
                          ignore_index=True),
        "sort_column_value_order": lambda: _svo(),
        "fill_direction": lambda: events[["event_id", "event_type"]]
            .assign(v=events.value.where(events.event_type == "click"))
            .sort_values("event_id").fill_direction(v="down"),
        "change_type": lambda: li3().change_type("l_quantity", int),
        "to_datetime": lambda: _to_datetime(),
        "convert_excel_date": lambda: lineitem[["l_orderkey", "l_linenumber"]]
            .assign(serial=(30000 + lineitem.l_orderkey % 10000))
            .convert_excel_date("serial"),
        "convert_unix_date": lambda: events[["event_id"]]
            .assign(epoch=1700000000 + events.event_id).convert_unix_date("epoch"),
        "truncate_datetime": lambda: _truncate_dt(),
        "groupby_agg_dropna": lambda: lineitem[["l_orderkey", "l_linenumber"]]
            .assign(flag=lineitem.l_returnflag.where(lineitem.l_returnflag != "N"),
                    l_quantity=lineitem.l_quantity)
            .groupby_agg(by="flag", agg="sum", agg_column_name="l_quantity",
                         new_column_name="sum_qty", dropna=True),
        "min_max_scale_jointly": lambda: lineitem[
            ["l_orderkey", "l_linenumber", "l_extendedprice", "l_quantity"]
        ].min_max_scale(column_name=["l_extendedprice", "l_quantity"],
                        jointly=True),
        "math_zscore": lambda: _zscore(),
        # ---- batch 3 ----
        "change_types": lambda: lineitem[
            ["l_orderkey", "l_linenumber", "l_quantity", "l_discount"]
        ].change_type(["l_quantity", "l_discount"], str),
        "toset": lambda: pd.DataFrame(
            {"l_returnflag": sorted(set(lineitem.l_returnflag.toset()))}),
        "convert_matlab_date": lambda: events[["event_id"]]
            .assign(datenum=738000.0 + events.event_id % 100 + 0.5)
            .convert_matlab_date("datenum"),
        "math_sigmoid": lambda: _sigmoid(),
        "math_logit": lambda: _logit(),
        "flag_jumps": lambda: _flag_jumps(),
        "pivot_longer": lambda: lineitem[
            ["l_orderkey", "l_linenumber", "l_quantity", "l_discount"]
        ].pivot_longer(index=["l_orderkey", "l_linenumber"],
                       names_to="name", values_to="value"),
        "expand_column": lambda: lineitem[["l_orderkey", "l_linenumber"]]
            .assign(labels=lineitem.l_returnflag + "," + lineitem.l_linestatus)
            .expand_column(column_name="labels", sep=","),
        # ---- batch 4 ----
        "select_columns": lambda: lineitem.select_columns("*key"),
        "pivot_wider": lambda: _pivot_wider(),
        "complete": lambda: events.groupby(["user_id", "event_type"])
            .size().reset_index(name="n")
            .complete("user_id", "event_type", fill_value={"n": 0}),
        "complete_literals": lambda: nationless_region()
            .complete({"r_regionkey": [0, 1, 2, 3, 4, 5, 6]},
                      fill_value={"r_name": "none"}),
        "math_ecdf": lambda: _ecdf(),
        # normal_cdf / probit are rows-only in the DuckDB gate (no erf
        # there) — THIS harness closes that gap: the reference runs on
        # scipy.stats.norm shimmed with the stdlib's exact NormalDist
        "math_normal_cdf": lambda: _normal_cdf(),
        "math_probit": lambda: _probit(),
        # ---- batch 5 ----
        "filter_date_range": lambda: lineitem[
            ["l_orderkey", "l_linenumber", "l_shipdate"]
        ].filter_date(column_name="l_shipdate",
                      start_date="1997-06-01", end_date="1997-08-31"),
        "groupby_agg_nunique": lambda: lineitem[
            ["l_orderkey", "l_linenumber", "l_returnflag"]
        ].groupby_agg(by="l_orderkey", agg="nunique",
                      agg_column_name="l_returnflag", new_column_name="n_flags"),
        "count_cumulative_unique_ci": lambda: _ccu_ci(),
        "fill_direction_downup": lambda: events[["event_id", "event_type"]]
            .assign(v=events.value.where(events.event_type == "click"))
            .sort_values("event_id").fill_direction(v="downup"),
        "find_replace_regex": lambda: events[["event_id", "event_type"]]
            .find_replace(match="regex",
                          event_type={"^cl": "KL", "ew$": "EW"}),
        "filter_string_complement": lambda: events[["event_id", "event_type"]]
            .filter_string(column_name="event_type",
                           search_string="^(click|view)$", complement=True),
        "take_first_desc": lambda: lineitem[["l_partkey", "l_shipdate"]]
            .take_first(subset=["l_partkey"], by="l_shipdate", ascending=False),
        "groupby_topk_asc": lambda: lineitem[["l_returnflag", "l_extendedprice"]]
            .groupby_topk("l_returnflag", "l_extendedprice", 3, ascending=True,
                          ignore_index=True),
        "expand": lambda: lineitem.expand("l_returnflag", "l_linestatus"),
        "expand_mixed": lambda: lineitem.expand(
            ["l_returnflag", "l_linestatus"], {"year": [1, 2, 3]}),
        "deconcatenate_column": lambda: part[["p_partkey", "p_name"]]
            .deconcatenate_column("p_name", sep=" ",
                                  new_column_names=["adjective", "noun"]),
        "deconcatenate_preserve": lambda: part[["p_partkey", "p_name", "p_size"]]
            .deconcatenate_column("p_name", sep=" ",
                                  new_column_names=["adjective", "noun"],
                                  preserve_position=True),
        "math_log": lambda: _mathcol("l_extendedprice", "log", 1e6, drop=True),
        "math_exp": lambda: _mathcol("l_discount", "exp", 1e10, drop=False),
        # ---- batch 6: pivot_longer variant family ----
        "pivot_longer_names_sep": lambda: lineitem[
            ["l_orderkey", "l_linenumber"]
        ].assign(m_qty=lineitem.l_quantity, m_disc=lineitem.l_discount)
            .pivot_longer(index=["l_orderkey", "l_linenumber"],
                          names_to=["prefix", "metric"], values_to="value",
                          names_sep="_"),
        "pivot_longer_dot_value": lambda: lineitem[
            ["l_orderkey", "l_linenumber"]
        ].assign(qty_a=lineitem.l_quantity, qty_b=lineitem.l_quantity * 2,
                 price_a=lineitem.l_extendedprice,
                 price_b=lineitem.l_extendedprice * 2)
            .pivot_longer(index=["l_orderkey", "l_linenumber"],
                          names_to=[".value", "grp"], names_sep="_"),
        "pivot_longer_dot_value_multi": lambda: lineitem[
            ["l_orderkey", "l_linenumber"]
        ].assign(x_1_mean=lineitem.l_quantity, x_2_mean=lineitem.l_quantity * 2,
                 y_1_mean=lineitem.l_discount, y_2_mean=lineitem.l_discount * 2)
            .pivot_longer(index=["l_orderkey", "l_linenumber"],
                          names_to=[".value", "time", ".value"],
                          names_pattern="(x|y)_([0-9])(_mean)"),
        "pivot_longer_dropna": lambda: events[["event_id"]]
            .assign(m_click=events.value.where(events.event_type == "click"),
                    m_view=events.value.where(events.event_type == "view"))
            .pivot_longer(index=["event_id"], names_to="name",
                          values_to="value", dropna=True),
        "pivot_longer_multi": lambda: _pl_base()
            .pivot_longer(index=["l_orderkey", "l_linenumber"],
                          names_to=["qty", "disc"],
                          names_pattern=["^qty", "^disc"]),
        "pivot_longer_dict": lambda: _pl_base()
            .pivot_longer(index=["l_orderkey", "l_linenumber"],
                          names_to=["qty", "disc"],
                          names_pattern=["^qty", "^disc"]),
        "pivot_longer_named_groups": lambda: lineitem[
            ["l_orderkey", "l_linenumber"]
        ].assign(x_1_mean=lineitem.l_quantity, x_2_mean=lineitem.l_quantity * 2,
                 y_1_mean=lineitem.l_discount, y_2_mean=lineitem.l_discount * 2)
            .pivot_longer(index=["l_orderkey", "l_linenumber"],
                          names_pattern="(?P<_>x|y)_(?P<time>[0-9])(?P<__>_mean)",
                          names_to=[".value", "time", ".value"]),
        "pivot_longer_values_to_multi": lambda: lineitem[
            ["l_orderkey", "l_linenumber"]
        ].assign(mango=lineitem.l_quantity, orange=lineitem.l_discount,
                 watermelon=lineitem.l_extendedprice, gin=lineitem.l_tax,
                 vodka=lineitem.l_quantity * 2)
            .pivot_longer(index=["l_orderkey", "l_linenumber"],
                          names_to=["fruit", "drink"],
                          values_to=["pounds", "ounces"],
                          names_pattern=["^(m|o|w)", "^(g|v)"]),
        "row_to_names": lambda: nation[["n_name", "n_regionkey"]]
            .sort_values("n_name").row_to_names(0, remove_rows=True),
        # collapse_levels: our struct columns are the stand-in for pandas
        # MultiIndex columns — build the MultiIndex frame and collapse
        "collapse_levels": lambda: _collapse_levels(),
        "select_rows_labels": lambda: nation.copy()
            .set_index("n_nationkey").select_rows([1, 5, 10]).reset_index(),
        # ---- batch 8: conditional_join family (the reference's most
        # intricate kernel, conditional_join.py:450-1148). Two documented
        # emulations: (a) the reference requires EXACT dtype equality on
        # non-equi columns (is_dtype_equal) where Spark casts freely, so
        # p_size is pre-cast to float64; (b) keep=first/last ties break
        # positionally in pandas vs our deterministic (condCols, restCols)
        # lexicographic order — pre-sorting the right frame to that order
        # makes positional == lexicographic (SURVEY §7.7).
        "conditional_join": lambda: lineitem[
            ["l_orderkey", "l_linenumber", "l_shipdate"]
        ].conditional_join(orders[["o_orderkey", "o_orderdate"]],
                           ("l_orderkey", "o_orderkey", "=="),
                           ("l_shipdate", "o_orderdate", ">")),
        "conditional_join_force": lambda: lineitem[
            ["l_orderkey", "l_linenumber", "l_shipdate"]
        ].conditional_join(orders[["o_orderkey", "o_orderdate"]],
                           ("l_orderkey", "o_orderkey", "=="),
                           ("l_shipdate", "o_orderdate", ">"), force=True),
        "conditional_join_keep_first": lambda: _pf().conditional_join(
            _bins_sorted(), ("p_size", "lo", ">="), ("p_size", "hi", "<="),
            keep="first"),
        "conditional_join_keep_last": lambda: _pf().conditional_join(
            _bins_sorted(), ("p_size", "lo", ">="), ("p_size", "hi", "<="),
            keep="last"),
        "conditional_join_left": lambda: _pf().conditional_join(
            _bins_sorted(), ("p_size", "lo", ">="), ("p_size", "hi", "<="),
            how="left"),
        "conditional_join_outer": lambda: _pf().conditional_join(
            _bins_sorted(), ("p_size", "lo", ">="), ("p_size", "hi", "<="),
            how="outer"),
        "conditional_join_indicator": lambda: _pf().conditional_join(
            _bins_sorted(), ("p_size", "lo", ">="), ("p_size", "hi", "<="),
            how="left", indicator=True),
        "conditional_join_right_keep": lambda: _pf().conditional_join(
            _bins_sorted(), ("p_size", "lo", ">="), ("p_size", "hi", "<="),
            how="right", keep="first"),
        "conditional_join_cols": lambda: _pf().conditional_join(
            _bins_sorted(), ("p_size", "lo", ">="), ("p_size", "hi", "<="),
            df_columns="p_partkey", right_columns="s_suppkey"),
        "conditional_join_ne": lambda: nation[["n_nationkey", "n_regionkey"]]
            .conditional_join(t("region")[["r_regionkey", "r_name"]],
                              ("n_regionkey", "r_regionkey", "!=")),
        "conditional_join_ne_nulls": lambda: _ne_nulls_left()
            .conditional_join(_ne_nulls_right(), ("n_rk", "r_rk", "!=")),
        "conditional_join_eq_nullsafe": lambda: _ne_nulls_left()
            .conditional_join(_eq_nullsafe_right(),
                              ("n_rk", "r_rk", "=="),
                              ("n_nationkey", "r_regionkey", ">")),
        "get_join_indices": lambda: _gji(),
        # ---- batch 9: the process_text dispatch surface — run pandas'
        # own .str methods (exactly what process_text.py:98-107 dispatches
        # to) over the same projections the gates compute
        "process_text": lambda: part[["p_partkey", "p_name"]]
            .process_text(column_name="p_name", string_function="upper"),
        "process_text_methods": lambda: _pt_methods(),
        "process_text_methods2": lambda: _pt_methods2(),
        # ---- batch 10: reshape / index / move ----
        "move_seq": lambda: lineitem.move(
            source=["l_shipdate", "l_orderkey"],
            target=["l_partkey", "l_suppkey"], position="after", axis=1),
        "move_rows": lambda: _move_rows(),
        "select_both": lambda: nation.copy().set_index("n_nationkey")
            .select(rows=[1, 5, 10], columns=["n_name"], invert=True)
            .reset_index(),
        "select_rows_invert": lambda: nation.copy().set_index("n_nationkey")
            .select_rows([1, 5, 10], invert=True).reset_index(),
        "select_rows_slice_step": lambda: t("customer")[
            ["c_custkey", "c_name", "c_acctbal"]
        ].set_index("c_custkey").sort_index()
            .select_rows(slice(1, 120, 3)).reset_index(),
        # the reference's own contract is select_rows(str) == .loc[str]
        # (test_select_rows.py:125-130 test_date_partial_output); on THIS
        # pandas version DatetimeIndex.get_loc lost partial-string support,
        # so .loc stands in for the intended partial-month semantics
        "select_rows_date_prefix": lambda: lineitem[
            ["l_orderkey", "l_linenumber", "l_shipdate"]
        ].set_index("l_shipdate").sort_index().loc["1996-03"].reset_index()
            [["l_orderkey", "l_linenumber", "l_shipdate"]],
        "collapse_glue": lambda: _collapse_glue(),
        "collapse_levels_rows": lambda: _collapse_rows(),
        "explode_index": lambda: _explode_index(),
        "explode_pattern": lambda: _explode_pattern(),
        "row_to_names_slice": lambda: _row_to_names_slice(),
        "expand_grid": lambda: _eg(),
        "expand_grid_frames": lambda: _eg_frames(),
        "complete_nesting": lambda: lineitem
            .assign(tax_cents=(lineitem.l_tax * 100).round(0).astype("int64"))
            .groupby(["l_returnflag", "l_linestatus", "tax_cents"])
            .size().reset_index(name="n")
            .complete(["l_returnflag", "l_linestatus"], "tax_cents",
                      fill_value={"n": 0}),
        # complete.py's by= + callable universe: the callable receives each
        # GROUP FRAME (apply_if_callable(obj=df))
        "complete_range_by": lambda: lineitem[lineitem.l_quantity > 25][
            ["l_orderkey", "l_linenumber", "l_quantity"]
        ].complete({"l_linenumber": lambda d: np.arange(
            d.l_linenumber.min(), d.l_linenumber.max() + 1)},
            by="l_orderkey", fill_value={"l_quantity": 0.0}),
        "pivot_longer_spec": lambda: _pl_spec(),
        # names_glue "{_value}_{names_from}" is tidyr's spelling; this
        # reference version only formats names_from values, but a LIST
        # values_from forces the same value_name-prefixed flatten
        "pivot_wider_glue": lambda: _pw_list(["o_totalprice"], "sum"),
        "pivot_wider_multi": lambda: _pw_list(["o_totalprice", "o_orderkey"],
                                              "max", scale=False),
        # ---- batch 11: types / transforms ----
        "drop_duplicate_columns": lambda: _dup_cols(),
        "groupby_agg_skew": lambda: li3().groupby_agg(
            by="l_orderkey", agg="sum", agg_column_name="l_quantity",
            new_column_name="sum_qty"),
        "sort_naturally": lambda: pd.DataFrame(
            {"tag": "p" + part.p_partkey.astype(str)})
            .sort_naturally("tag").head(20),
        # our fill_direction grows a partitionBy= the reference verb lacks;
        # pandas' grouped ffill is the well-defined oracle for it
        "fill_direction_grouped": lambda: _fill_dir_grouped(),
        "change_type_keep_values": lambda: events[["event_id"]]
            .assign(uid=np.where(events.event_id % 3 == 0,
                                 "u" + events.user_id.astype(str),
                                 events.user_id.astype(str)))
            .change_type("uid", int, ignore_exception="keep_values"),
        "change_type_keep_values_all_cast": lambda: events[["event_id"]]
            .assign(uid=events.user_id.astype(str))
            .change_type("uid", int, ignore_exception="keep_values"),
        "label_encode": lambda: events[["event_id", "event_type"]]
            .sort_values("event_id").label_encode("event_type"),
        "math_softmax": lambda: _softmax(),
        "transform_column": lambda: _transform_column(),
        "transform_columns_multi": lambda: lineitem[
            ["l_orderkey", "l_linenumber", "l_quantity", "l_discount"]
        ].transform_columns(["l_quantity", "l_discount"],
                            lambda s: (s * 2 * 1e4).round(0).astype("int64"),
                            elementwise=False),
        "add_column": lambda: orders[["o_orderkey", "o_totalprice"]]
            .add_column("fee", orders.o_totalprice * 0.1)
            .add_column("tag", "x"),
        # fill_remaining CYCLES the iterable (add_columns.py fill_remaining)
        "add_column_iterable": lambda: events[["event_id", "user_id"]]
            .sort_values("event_id")
            .add_column("tag", ["a", "b", "c"], fill_remaining=True),
        "join_apply": lambda: lineitem[
            ["l_orderkey", "l_linenumber", "l_extendedprice", "l_discount"]
        ].join_apply(lambda r: int(round(
            r.l_extendedprice * (1 - r.l_discount) * 1e6)), "net"),
        # clean_names(axis=None, column_names=...) cleans VALUES
        # (clean_names.py:121-123)
        "clean_names_values": lambda: events[["event_id"]]
            .assign(etype="Typ E-" + events.event_type)
            .clean_names(axis=None, column_names=["etype"]),
        "unionize_categories": lambda: _unionize(),
        # explicit uniform edges through the reference's pd.cut wrapper —
        # this mapping CAUGHT the r18 left-closed divergence
        "bin_numeric": lambda: li3().bin_numeric(
            from_column_name="l_quantity", to_column_name="qty_bin",
            bins=np.linspace(0, 50, 11), labels=False, include_lowest=True),
        "bin_numeric_labels": lambda: li3().bin_numeric(
            from_column_name="l_quantity", to_column_name="qty_label",
            bins=np.linspace(0, 50, 6), labels=["q1", "q2", "q3", "q4", "q5"],
            include_lowest=True),
        # order='sort'/'appearance' registries surfaced as code columns
        "encode_categorical_sort": lambda: _enc_cat("sort"),
        "encode_categorical_appearance": lambda: _enc_cat("appearance"),
        # asof family vs pandas merge_asof — the exact contract the operator
        # documents (right side pre-aggregated to unique (by, on) so the
        # duplicate-timestamp tie-break cannot differ between engines)
        "asof_join": lambda: _asof("backward", by=True),
        "asof_join_nearest": lambda: _asof("nearest", by=True),
        "asof_join_forward_tol": lambda: _asof("forward", by=True,
                                               tolerance="1h"),
        "asof_join_global": lambda: _asof("backward", by=False),
        "fill_missing_timestamps": lambda: _fill_ts(),
        # ---- batch 10 (r19): io readers, ml, biology, accessors ----
        # the io gates regenerate their file inputs from sf_dir (content
        # identical to what the Spark gate derives from the same sf_dir at
        # Verify time) rather than reading target/tmp leftovers — a bench
        # run at another SF overwrites those between Verify and this script
        "read_csvs": lambda: read_csvs(f"{_io_scratch()}/demo/*.csv"),
        # separate_df=True returns {basename: df} (io.py:66-68); re-union
        # with the key as `src`, exactly as the Spark gate does
        "read_csvs_separate": lambda: pd.concat(
            [df.assign(src=name) for name, df in sorted(read_csvs(
                f"{_io_scratch()}/sep/*.csv",
                separate_df=True).items())], ignore_index=True),
        "read_commandline": lambda: read_commandline(
            "printf 'a,b\\n1,x\\n2,y\\n'"),
        "get_features_targets": lambda: lineitem[
            ["l_orderkey", "l_linenumber", "l_quantity", "l_returnflag"]]
            .get_features_targets(target_column_names=["l_returnflag"])[0],
        "join_fasta": lambda: t("customer")[["c_custkey"]]
            .assign(sid="seq" + (t("customer").c_custkey % 3).astype(str))
            .join_fasta(filename=f"{_io_scratch()}/demo.fasta",
                        id_col="sid", column_name="sequence"),
        # explicit-array registry: values outside the category set null out
        # (encode_categorical.py:162 astype(CategoricalDtype)); the gate
        # compares the distinct value set after the stamp
        "encode_categorical": lambda: t("events")[["event_type"]]
            .encode_categorical(event_type=[
                "click", "view", "purchase", "signup", "error"])
            .drop_duplicates(),
        "encode_categorical_expand": lambda: _enc_expand(),
        "data_description": lambda: _data_desc(),
        # strict=True dedups the ts index keeping the first POSITIONAL
        # occurrence (timeseries.py strict branch) — positional order is
        # pinned to event_id so it equals the Spark gate's takeFirst
        "sort_timestamps_monotonically": lambda: _sort_ts(),
        "expand_by": lambda: lineitem.expand(
            "l_linestatus", "l_linenumber", by="l_returnflag").reset_index(),
    }

    def _collapse_levels():
        d = pd.DataFrame({("m", "v"): events.value,
                          ("m", "u"): events.user_id,
                          ("event_id", ""): events.event_id})
        out = d.collapse_levels("_")
        return out.rename(columns={"event_id_": "event_id"})

    def _pl_base():
        return lineitem[["l_orderkey", "l_linenumber"]].assign(
            qty1=lineitem.l_quantity, qty2=lineitem.l_quantity * 2,
            disc1=lineitem.l_discount, disc2=lineitem.l_discount * 2)

    def _mathcol(src_col, fn, scale, drop):
        import janitor.math  # noqa: F401
        d = lineitem[["l_orderkey", "l_linenumber", src_col]].copy()
        s = getattr(d[src_col], fn)()
        d["v"] = (s * scale).round(0).astype("int64")
        return d.drop(columns=src_col) if drop else d

    def _ccu_ci():
        d = events[["event_id"]].copy()
        d["etype"] = np.where(events.event_id % 2 == 0,
                              events.event_type.str.upper(), events.event_type)
        return d.sort_values("event_id").count_cumulative_unique(
            column_name="etype", dest_column_name="cum_unique",
            case_sensitive=False)

    def _normal_cdf():
        import janitor.math  # noqa: F401
        d = lineitem[["l_orderkey", "l_linenumber", "l_discount"]].copy()
        d["v"] = ((d.l_discount * 10 - 0.5).normal_cdf() * 1e6) \
            .round(0).astype("int64")
        return d

    def _probit():
        import janitor.math  # noqa: F401
        d = lineitem[["l_orderkey", "l_linenumber", "l_discount"]].copy()
        d["v"] = ((d.l_discount + 0.01).probit() * 1e6).round(0).astype("int64")
        return d

    def nationless_region():
        return t("region")[["r_regionkey", "r_name"]]

    def _pivot_wider():
        d = orders[["o_custkey", "o_orderstatus", "o_totalprice"]] \
            .groupby(["o_custkey", "o_orderstatus"]).sum().reset_index() \
            .pivot(index="o_custkey", columns="o_orderstatus",
                   values="o_totalprice").reset_index()
        d.columns.name = None
        for c in ("F", "O", "P"):
            d[c] = (d[c] * 1e4).round(0).astype("Int64")
        return d

    def _ecdf():
        # reference janitor ecdf is a Series->arrays helper; the GATE's
        # contract is the classic ECDF rank/n per row — replicate with the
        # same average-free definition (rank method="max" / n)
        d = lineitem[["l_orderkey", "l_linenumber", "l_quantity"]].copy()
        n = len(d)
        d["p"] = (d.l_quantity.rank(method="max") / n).round(6)
        return d

    def _sigmoid():
        import janitor.math  # noqa: F401  (registers Series .sigmoid)
        d = lineitem[["l_orderkey", "l_linenumber", "l_discount"]].copy()
        d["sig"] = (d.l_discount.sigmoid() * 1e10).round(0).astype("int64")
        return d

    def _logit():
        import janitor.math  # noqa: F401
        d = lineitem[["l_orderkey", "l_linenumber"]].copy()
        d["p"] = lineitem.l_discount + 0.01
        d["lg"] = (d.p.logit() * 1e10).round(0).astype("int64")
        return d

    def _flag_jumps():
        from janitor.timeseries import flag_jumps
        d = events[["event_id", "value"]].sort_values("event_id") \
            .set_index("event_id")
        out = flag_jumps(d, scale="absolute", direction="any", threshold=10.0)
        out = out.reset_index().rename(columns={"value_jump_flag": "jump"})
        return out

    def _svo():
        order = ["signup", "click", "view", "purchase", "error"]
        rank = {v: i for i, v in enumerate(order)}
        d = events[["event_id", "event_type"]].copy()
        d["type_rank"] = d.event_type.map(rank)
        return d.sort_column_value_order(
            "event_type", {v: i for i, v in enumerate(order)})

    def _to_datetime():
        d = lineitem[["l_orderkey", "l_linenumber"]].copy()
        d["ship_str"] = pd.to_datetime(lineitem.l_shipdate).dt.strftime(
            "%Y-%m-%d %H:%M:%S")
        return d.to_datetime("ship_str", format="%Y-%m-%d %H:%M:%S")

    def _truncate_dt():
        from janitor.functions.truncate_datetime import truncate_datetime_dataframe
        d = events[["event_id", "ts"]].copy()
        d["ts"] = pd.to_datetime(d.ts)
        out = truncate_datetime_dataframe(d, "HOUR")
        out["ts_hour"] = out.pop("ts").dt.strftime("%Y-%m-%d %H:%M:%S")
        return out

    def _zscore():
        d = lineitem[["l_orderkey", "l_linenumber", "l_extendedprice"]].copy()
        s = d.l_extendedprice
        d["z"] = ((s - s.mean()) / s.std() * 1e6).round(0).astype("int64")
        return d.drop(columns="l_extendedprice")

    def _mms():
        d = lineitem[["l_orderkey", "l_linenumber", "l_extendedprice"]].copy()
        out = d.min_max_scale(column_name="l_extendedprice")
        out["scaled"] = out.pop("l_extendedprice")
        return out

    def _currency():
        d = orders[["o_orderkey"]].copy()
        price = orders.o_totalprice.round(2).map(_num_str)
        d["amount"] = np.where(orders.o_orderkey % 2 == 1,
                               " (" + price + ")", price)
        return d.currency_column_to_numeric("amount", cleaning_style="accounting")

    def _num_str(v):
        # Spark double->string: integral values print with .0, like python str
        return str(v)

    # ---- batch 10/11 helpers ----
    def _move_rows():
        d = nation.sort_values("n_name").set_index("n_name")
        out = d.move(source="NATION_3", target="NATION_17",
                     position="after", axis=0).reset_index()
        out["row_pos"] = range(len(out))
        return out

    def _collapse_glue():
        d = pd.DataFrame({("m", "v"): events.value, ("m", "u"): events.user_id,
                          ("event_id", ""): events.event_id})
        # glue formats with the LEVEL NAMES (collapse_levels.py:132-135
        # format_map over dict(zip(index.names, entry)))
        # python format_map treats "{0}" as positional even with string
        # keys, so the positional template maps to named levels a/b — the
        # same glue machinery, reference-expressible spelling
        d.columns = pd.MultiIndex.from_tuples(d.columns, names=["a", "b"])
        out = d.collapse_levels(glue="{a}X{b}")
        # our struct stand-in has no second level for plain columns; pandas'
        # MultiIndex pads one, gluing "event_idX" — same normalization as
        # the trailing-sep rename in _collapse_levels
        return out.rename(columns={"event_idX": "event_id"})

    def _collapse_rows():
        d = lineitem[["l_returnflag", "l_linestatus", "l_orderkey",
                      "l_linenumber", "l_quantity"]]
        out = d.set_index(["l_returnflag", "l_linestatus"]).collapse_levels(
            axis="index", glue="{l_returnflag}-{l_linestatus}")
        return out.reset_index(names="index")

    def _explode_index():
        d = pd.DataFrame({"event_id": events.event_id, "m_v": events.value,
                          "m_u": events.user_id})
        return d.explode_index(names_sep="_").collapse_levels("_")

    def _explode_pattern():
        d = events[["event_id", "user_id", "value"]]
        p = d.explode_index(names_pattern="(?P<a>.+)_(?P<b>.+)")
        # a non-matching label becomes (NaN, NaN) in pandas — the label is
        # LOST; our engine keeps it (documented divergence), so restore it
        # before the round-trip collapse
        cols = []
        for orig, tup in zip(d.columns, p.columns):
            bad = any(isinstance(x, float) and np.isnan(x) for x in tup)
            cols.append((orig, "") if bad else tup)
        p.columns = pd.MultiIndex.from_tuples(cols)
        return p.collapse_levels("_").rename(columns={"value_": "value"})

    def _row_to_names_slice():
        d = nation[["n_name", "n_regionkey"]].sort_values("n_name")
        r = d.row_to_names([0, 1], remove_rows=True)
        # flat-name analog of the resulting MultiIndex header (collapse
        # precedent: joined with "_")
        r.columns = ["_".join(map(str, tup)) for tup in r.columns]
        return r

    def _eg():
        from janitor.functions.expand_grid import expand_grid
        out = expand_grid(others={"k": [1, 2, 3], "v": ["a", "b"]})
        out.columns = [tup[0] for tup in out.columns]
        return out

    def _eg_frames():
        from janitor.functions.expand_grid import expand_grid
        r = t("region")[["r_regionkey", "r_name"]]
        n = nation[nation.n_nationkey < 3][["n_nationkey", "n_name"]]
        out = expand_grid(others={"r": r, "n": n})
        out.columns = [f"{a}_{b}" for a, b in out.columns]
        return out

    def _pl_spec():
        from janitor.functions import pivot_longer_spec
        spec = pd.DataFrame({".name": ["l_quantity", "l_discount"],
                             ".value": ["val", "val"],
                             "kind": ["quantity", "discount"]})
        return pivot_longer_spec(
            lineitem[["l_orderkey", "l_linenumber", "l_quantity",
                      "l_discount"]], spec=spec)

    def _pw_list(values_from, agg, scale=True):
        d = orders.groupby(["o_custkey", "o_orderstatus"], as_index=False)[
            values_from].agg(agg)
        out = d.pivot_wider(index="o_custkey", names_from="o_orderstatus",
                            values_from=values_from)
        if scale:
            for c in out.columns:
                if c != "o_custkey":
                    out[c] = (out[c] * 1e4).round(0).astype("Int64")
        return out

    def _dup_cols():
        d = pd.concat([lineitem[["l_orderkey", "l_linenumber"]],
                       lineitem.l_quantity.rename("q"),
                       lineitem.l_discount.rename("q")], axis=1)
        return d.drop_duplicate_columns(column_name="q", nth_index=0)

    def _fill_dir_grouped():
        d = events[["event_id", "event_type"]].assign(
            v=events.value.where(events.value >= 1)).sort_values("event_id")
        d["v"] = d.groupby("event_type")["v"].ffill()
        return d

    def _softmax():
        import janitor.math  # noqa: F401
        d = lineitem[["l_orderkey", "l_linenumber", "l_discount"]].copy()
        d["sm"] = (d.l_discount.softmax() * 1e12).round(0).astype("int64")
        return d

    def _transform_column():
        d = lineitem[["l_orderkey", "l_linenumber", "l_extendedprice"]]
        out = d.transform_column("l_extendedprice", np.log, "log_price")
        out["log_price"] = (out.log_price * 1e6).round(0).astype("int64")
        return out.drop(columns="l_extendedprice")

    def _unionize():
        a = events[events.event_type.isin(["click", "view"])].copy()
        a["event_type"] = a.event_type.astype("category")
        b = events[events.event_type.isin(["purchase", "signup"])].copy()
        b["event_type"] = b.event_type.astype("category")
        import janitor as jn
        outs = jn.unionize_dataframe_categories(a, b, column_names="event_type")
        return pd.DataFrame(
            {"category": list(outs[0].event_type.cat.categories)})

    def _fill_ts():
        from janitor.timeseries import fill_missing_timestamps
        h = events.assign(hour=pd.to_datetime(events.ts).dt.floor("h")) \
            .groupby("hour").size().reset_index(name="n")
        filled = fill_missing_timestamps(h.set_index("hour"), frequency="1h")
        filled = filled.reset_index(names="hour")
        filled["n"] = filled.n.fillna(0).astype("int64")
        filled["hour"] = filled.hour.dt.strftime("%Y-%m-%d %H:%M:%S")
        return filled

    def _asof(direction, by, tolerance=None):
        ev = events.assign(ts=pd.to_datetime(events.ts))
        lcols = ["event_id", "user_id", "ts"] if by else ["event_id", "ts"]
        views = ev[ev.event_type == "view"][lcols].sort_values("ts")
        gkeys = ["user_id", "ts"] if by else ["ts"]
        clicks = ev[ev.event_type == "click"].groupby(gkeys, as_index=False) \
            .value.max().rename(columns={"value": "click_value"}) \
            .sort_values("ts")
        kwargs = {"by": "user_id"} if by else {}
        if tolerance is not None:
            kwargs["tolerance"] = pd.Timedelta(tolerance)
        return pd.merge_asof(views, clicks, on="ts", direction=direction,
                             **kwargs)

    def _enc_cat(order):
        d = events[["event_id", "event_type"]].sort_values("event_id")
        enc = d.encode_categorical(event_type=order)
        enc["code"] = enc.event_type.cat.codes
        enc["event_type"] = enc.event_type.astype(str)
        return enc

    # ---- batch 8 helpers: conditional_join family ----
    def _bins():
        sup = t("supplier")
        return pd.DataFrame({"s_suppkey": sup.s_suppkey,
                             "lo": (sup.s_suppkey % 10) * 5.0,
                             "hi": (sup.s_suppkey % 10) * 5.0 + 7.0})

    def _bins_sorted():
        # positional order := our deterministic keep order (condCols then
        # restCols, ascending) so pandas' positional first/last equals our
        # lexicographic min/max (SURVEY §7.7)
        return _bins().sort_values(["lo", "hi", "s_suppkey"],
                                   kind="mergesort").reset_index(drop=True)

    def _pf():
        # the reference requires exact dtype equality on non-equi columns
        # (conditional_join.py:439-446 is_dtype_equal); Spark casts the int
        # side implicitly — emulate with an explicit float64 cast
        return part[["p_partkey", "p_size"]].assign(
            p_size=part.p_size.astype("float64"))

    def _ne_nulls_left():
        return pd.DataFrame({
            "n_nationkey": nation.n_nationkey.astype("int64"),
            "n_rk": nation.n_regionkey.astype("float64")
                .where(nation.n_nationkey % 5 != 0)})

    def _ne_nulls_right():
        r = t("region")
        return pd.DataFrame({
            "r_rk": r.r_regionkey.astype("float64").where(r.r_regionkey != 2),
            "r_name": r.r_name})

    def _eq_nullsafe_right():
        r = t("region")
        return pd.DataFrame({
            "r_regionkey": r.r_regionkey.astype("int64"),
            "r_rk": r.r_regionkey.astype("float64").where(r.r_regionkey != 2)})

    def _gji():
        from janitor.functions.conditional_join import get_join_indices
        b = _bins()
        lidx, ridx = get_join_indices(
            _pf(), b, [("p_size", "lo", ">="), ("p_size", "hi", "<=")])
        return pd.DataFrame({
            "p_partkey": part.p_partkey.to_numpy()[lidx],
            "s_suppkey": b.s_suppkey.to_numpy()[ridx]})

    # ---- batch 9 helpers: the .str methods process_text dispatches to ----
    def _pt_methods():
        name = part.p_name
        partn = name.str.partition(" ")
        tbl = str.maketrans("aeio", "AEIO")
        tbl[ord("u")] = None  # Spark translate deletes unmatched from-chars
        return pd.DataFrame({
            "p_partkey": part.p_partkey,
            "n": name.str.len(),
            "has_gre": name.str.contains("gre", regex=False),
            "first_word": name.str.extract(r"([a-z]+)", expand=False),
            "z": name.str.zfill(30),
            "noprefix": name.str.removeprefix("a"),
            "sl": name.str.slice(2, 5),
            "nsp": name.str.count(" "),
            "catx": name.str.cat(pd.Series("X", index=name.index), sep="|"),
            "wr": name.str.wrap(15),
            "nrm": (name + "é").str.normalize("NFC"),
            "part_head": partn[0],
            "part_tail": partn[2],
            "tr": name.str.translate(tbl),
        })

    def _pt_methods2():
        name = part.p_name
        rpart = name.str.rpartition(" ")
        fa = name.str.findall("[aeiou]+")
        mixed = name.str.title().where(part.p_partkey % 2 == 0, name)
        return pd.DataFrame({
            "p_partkey": part.p_partkey,
            "slrep": name.str.slice_replace(2, 5, "X"),
            "ctr": name.str.center(30, "."),
            "padl": name.str.pad(28, side="left", fillchar="_"),
            "n_vowel_runs": fa.str.len(),
            "first_vowel_run": fa.str[0],
            "m": name.str.match("[a-z]+ "),
            "fm": name.str.fullmatch("[a-z ]+"),
            "rf": name.str.rfind(" "),
            "rp_head": rpart[0],
            "rp_tail": rpart[2],
            "joined": name.str.join("-"),
            "isdec": part.p_partkey.astype(str).str.isdecimal(),
            "ist": mixed.str.istitle(),
            "rt": name.str.encode("UTF-8").str.decode("UTF-8"),
        })

    # ---- batch 10 helpers ----
    _scratch = {}

    def _io_scratch():
        # file inputs for the io gates, rebuilt from sf_dir: demo/ = the
        # lineitem rows the Spark read_csvs gate round-trips (QueriesDomain
        # "read_csvs"), split across two CSVs to exercise the multi-file
        # concat; sep/ = the nation low/high pair (QueriesDomain
        # "read_csvs_separate"); demo.fasta = the gate's pinned literal
        if _scratch:
            return _scratch["dir"]
        # fixed path, rebuilt per run — mkdtemp would leak one tree per
        # invocation across rounds
        import os
        import shutil
        d = "/tmp/ref_diff_io_scratch"
        shutil.rmtree(d, ignore_errors=True)
        os.makedirs(f"{d}/demo")
        li = lineitem.loc[lineitem.l_orderkey < 100,
                          ["l_orderkey", "l_linenumber", "l_returnflag"]]
        li[li.l_orderkey % 2 == 0].to_csv(f"{d}/demo/even.csv", index=False)
        li[li.l_orderkey % 2 == 1].to_csv(f"{d}/demo/odd.csv", index=False)
        os.makedirs(f"{d}/sep")
        na = nation[["n_nationkey", "n_name", "n_regionkey"]].sort_values(
            "n_nationkey")
        na[na.n_regionkey < 2].to_csv(f"{d}/sep/low.csv", index=False)
        na[na.n_regionkey >= 2].to_csv(f"{d}/sep/high.csv", index=False)
        with open(f"{d}/demo.fasta", "w") as fh:
            fh.write(">seq0 demo\nACGT\nACGT\n>seq1\nTTTT\n>seq2\nGGCC\n")
        _scratch["dir"] = d
        return d

    def _enc_expand():
        # registry inferred order='sort' from the FULL frame, one category
        # filtered away; names_expand must re-materialize it all-null
        # (encode_categorical.py:150-166 + pivot.py names_expand)
        d = events[["user_id", "event_type", "value"]].encode_categorical(
            event_type="sort")
        d = d.loc[d.event_type != "error"]
        # groupby-sum is the gate's agg="sum" prep; observed=True keeps the
        # categorical dtype (full registry) on the group key
        g = d.groupby(["user_id", "event_type"], observed=True,
                      as_index=False).value.sum()
        r = g.pivot_wider(index="user_id", names_from="event_type",
                          values_from="value", names_expand=True)
        for c in ["click", "purchase", "signup", "view"]:
            r[c] = (r[c] * 1e4).round()
        return r

    def _data_desc():
        # dtype naming is engine representation (int64 vs bigint) — the
        # value-determined subset is (column_name, count, null_count);
        # ours_proj drops our dtype/description columns to match
        d = lineitem[["l_orderkey", "l_quantity", "l_returnflag"]]
        r = d.data_description.df.reset_index()
        return pd.DataFrame({
            "column_name": r.column_name,
            "count": r["count"],
            "null_count": (r.pct_missing * len(d)).round().astype("int64")})

    def _sort_ts():
        e = (events[["event_id", "ts", "user_id"]]
             .sort_values("event_id", kind="mergesort").set_index("ts"))
        r = e.sort_timestamps_monotonically(
            direction="increasing", strict=True).reset_index()
        return pd.DataFrame({
            "event_id": r.event_id,
            "ts_str": r.ts.dt.strftime("%Y-%m-%d %H:%M:%S.%f"),
            "user_id": r.user_id})

    # project OUR output before comparing, where the mapped reference case
    # covers only the value-determined subset of the gate's columns
    ours_proj = {
        "take_first": lambda d: d[["l_partkey", "l_shipdate"]],
        "take_first_desc": lambda d: d[["l_partkey", "l_shipdate"]],
        "groupby_topk": lambda d: d[["l_returnflag", "l_extendedprice"]],
        "groupby_topk_asc": lambda d: d[["l_returnflag", "l_extendedprice"]],
        "data_description": lambda d: d[
            ["column_name", "count", "null_count"]],
    }

    matched, failures, skipped = 0, [], []
    for name, fn in sorted(cases.items()):
        try:
            ours = pd.read_parquet(f"{out_dir}/{name}")  # Spark output dir
            ours = ours_proj.get(name, lambda d: d)(ours)
        except Exception:
            skipped.append(name)
            continue
        try:
            a, b = canon(fn()), canon(ours)
            if list(a.columns) != list(b.columns):
                failures.append((name, f"columns {list(a.columns)} vs {list(b.columns)}"))
            elif len(a) != len(b):
                failures.append((name, f"rows {len(a)} vs {len(b)}"))
            elif not a.equals(b):
                neq = (a != b) & ~(a.isna() & b.isna())
                detail = ""
                nz = neq.to_numpy().nonzero()
                if len(nz[0]):
                    r, c = nz[0][0], nz[1][0]
                    detail = (f"first diff row {r} col {a.columns[c]}: "
                              f"ref={a.iat[r, c]!r} ours={b.iat[r, c]!r}")
                failures.append((name, f"values differ; {detail}"))
            else:
                matched += 1
                print(f"MATCH\t{name}")
        except Exception as e:
            failures.append((name, f"{type(e).__name__}: {str(e)[:100]}"))
    for name, why in failures:
        print(f"DIFF\t{name}\t{why}")
    for name in skipped:
        print(f"SKIP\t{name}\t(no verify output)")
    print(f"{matched}/{len(cases)} mapped gates match the reference "
          f"implementation exactly (canonical column/row order, floats @6dp)")


if __name__ == "__main__":
    main()
