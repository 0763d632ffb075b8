#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: compare Verify output
parquet against DuckDB oracle SQL over the same testdata tables.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir>
"""
import json, os, sys
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize timestamp resolutions (us vs ns) and tz
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None) if getattr(df[c].dt, 'tz', None) else pd.to_datetime(df[c])
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    for name in sorted(os.listdir(out_dir)):
        qdir = os.path.join(out_dir, name)
        if not os.path.isdir(qdir):
            continue
        try:
            spark_df = pd.concat([pd.read_parquet(os.path.join(qdir, f))
                                  for f in os.listdir(qdir) if f.endswith(".parquet")],
                                 ignore_index=True)
        except Exception as e:
            results[name] = f"SPARK-READ-FAIL {e}"
            continue
        if name not in oracle:
            results[name] = f"rows-only ({len(spark_df)})"
            continue
        try:
            duck_df = con.execute(oracle[name]).df()
        except Exception as e:
            results[name] = f"ORACLE-FAIL {str(e).splitlines()[0][:150]}"
            continue
        a, b = canon(spark_df), canon(duck_df)
        if list(a.columns) != list(b.columns):
            results[name] = f"SCHEMA-MISMATCH spark={list(a.columns)} duck={list(b.columns)}"
            continue
        # dtype-parity gate (VERDICT r11 #1/#2): an uncast DuckDB integer
        # sum() returns HUGEINT -> pandas float64, which the driver's
        # dtype-aware hash diverges on ("3.0" vs "3") while a value-only
        # compare is blind. Flag any integral-vs-float kind mismatch.
        dt_bad = []
        for c in a.columns:
            ka = a[c].dtype.kind  # i/u int, f float, O object, M datetime, b bool
            kb = b[c].dtype.kind
            if ka != kb and {ka, kb} & {"i", "u", "f"} and not (
                    {ka, kb} <= {"i", "u"}):
                dt_bad.append(f"{c}: spark={a[c].dtype} duck={b[c].dtype}")
            elif ka == kb == "f" and a[c].dtype.itemsize != b[c].dtype.itemsize:
                # f4 vs f8 shortest-repr rendering differs for values not
                # exactly representable (1/3 -> '0.33333334' vs
                # '0.3333333333333333') -- same divergence class
                dt_bad.append(f"{c}: spark={a[c].dtype} duck={b[c].dtype}"
                              " (float width)")
        if dt_bad:
            results[name] = ("DTYPE-MISMATCH (driver hash WILL diverge; cast "
                             "the oracle projection) " + "; ".join(dt_bad))
        elif len(a) != len(b):
            results[name] = f"ROWCOUNT spark={len(a)} duck={len(b)}"
        else:
            try:
                pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)
                results[name] = "OK"
            except AssertionError as e:
                # retry with tolerance to show magnitude of diff
                try:
                    pd.testing.assert_frame_equal(a, b, check_dtype=False, rtol=1e-9, atol=1e-12)
                    results[name] = "OK-approx (exact hash may differ!)"
                except AssertionError:
                    results[name] = "VALUE-MISMATCH " + str(e).splitlines()[0][:150]
    # the driver compares EXACT hashes — OK-approx would fail there, so it
    # must never be conflated with a pass
    npass = sum(1 for v in results.values() if v == "OK")
    napprox = sum(1 for v in results.values() if v.startswith("OK-approx"))
    for k, v in sorted(results.items()):
        tag = ('PASS' if v == 'OK'
               else 'ROWS' if v.startswith('rows-only')
               else 'APPROX' if v.startswith('OK-approx')
               else 'FAIL')
        print(f"{tag}\t{k}\t{v}")
    print(f"\n{npass}/{len(results)} comparable queries pass exactly"
          + (f" ({napprox} approx-only = would FAIL driver hash)" if napprox else ""))


if __name__ == "__main__":
    main()
