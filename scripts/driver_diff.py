#!/usr/bin/env python3
"""Triage the driver's CORRECTNESS_rN.json against the local stand-in.

Rounds 8-11's driver-only hash divergences were ONE defect class: uncast
integer sums in DuckDB oracles return HUGEINT, which pandas renders as
float64 ("3.0" vs Spark's int64 "3") — value-blind compares never saw it
(VERDICT r11; COVERAGE.md "Driver-hash integer-sum (HUGEINT) policy").
check.py is now dtype-strict (DTYPE-MISMATCH), so a driver-only red with a
green local line should be rare; when one appears, suspect the oracle's
RESULT TYPE first (run the oracle in DuckDB and inspect .df().dtypes).
This tool makes the first move of a round mechanical: for every non-green
driver row, say whether the local gate agrees (a real defect) or disagrees
(driver-only divergence — suspect the projection types, not the operator).

Usage:
  python3 scripts/driver_diff.py CORRECTNESS_r11.json [sfDir verifyOutDir]

With sfDir/verifyOutDir the local check is (re)run for the failing queries
only; without, it just classifies the driver file.
"""
import json, os, subprocess, sys


def main():
    driver_file = sys.argv[1]
    d = json.load(open(driver_file))
    fails, rows_only, passes = [], [], 0
    for name, r in sorted(d.items()):
        if r.get("err") == "no_oracle":
            rows_only.append(name)
        elif all(r.get(k) for k in ("rows_match", "schema_match", "hash_match")):
            passes += 1
        else:
            fails.append((name, r))
    print(f"driver: {passes} pass, {len(fails)} fail, {len(rows_only)} rows-only "
          f"of {len(d)} rows ({driver_file})")
    for name in rows_only:
        print(f"  rows-only: {name}")
    if not fails:
        print("no driver failures — nothing to triage")
        return
    for name, r in fails:
        kind = ("rows" if not r.get("rows_match")
                else "schema" if not r.get("schema_match") else "hash")
        print(f"  FAIL[{kind}] {name}: spark_rows={r.get('spark_rows')} "
              f"oracle_rows={r.get('oracle_rows')} err={r.get('err')}")
    if len(sys.argv) < 4:
        print("\n(no sfDir/outDir given — run with them to cross-check locally)")
        return
    sf_dir, out_dir = sys.argv[2], sys.argv[3]
    print(f"\nre-running the {len(fails)} failing queries locally into {out_dir}")
    print("(note: the restricted Verify rewrites <outDir>/oracle_sql.json "
          "filtered to these queries — use a scratch dir, not a full-run dir)")
    names = ",".join(n for n, _ in fails)
    env = dict(os.environ, SPARK_GRAFT_QUERIES=names)
    try:
        subprocess.run(["sbt", "-batch",
                        f"runMain graft.Verify {sf_dir} {out_dir}"],
                       env=env, check=True, capture_output=True, text=True)
    except subprocess.CalledProcessError as e:
        print("local Verify failed; sbt output follows:")
        print(e.stdout or "", e.stderr or "")
        raise
    chk = subprocess.run([sys.executable, "scripts/check.py", sf_dir, out_dir],
                         capture_output=True, text=True)
    local = {}
    for line in chk.stdout.splitlines():
        parts = line.split("\t")
        if len(parts) >= 2 and parts[0] in ("PASS", "FAIL", "APPROX"):
            local[parts[1]] = parts[0]
    print(chk.stdout)
    for name, _ in fails:
        verdict = local.get(name, "?")
        if verdict in ("PASS", "APPROX"):
            qual = "value-exact" if verdict == "PASS" else "within rtol only"
            print(f"  {name}: DRIVER-ONLY divergence (local {qual}) — suspect "
                  "double-typed output columns / oracle version drift, NOT the operator")
        elif verdict == "FAIL":
            print(f"  {name}: REAL defect (local agrees it fails) — fix the operator/oracle")
        else:
            print(f"  {name}: local verdict unavailable")


if __name__ == "__main__":
    main()
