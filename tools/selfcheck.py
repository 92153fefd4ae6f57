#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run graft.Verify
output against the DuckDB oracle and diff per query.

Usage: python3 tools/selfcheck.py <sfDir> <verifyOutDir>
"""
import glob
import json
import os
import sys

import duckdb


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for p in glob.glob(f"{sf_dir}/*.parquet"):
        name = os.path.basename(p)[: -len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)

    failures = 0
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    for name in names:
        got = con.execute(
            f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchdf()
        if name not in oracles:
            status = f"rows-only: {len(got)} rows"
            if len(got) == 0:
                status += "  ** EMPTY **"
                failures += 1
            print(f"{name:32s} {status}")
            continue
        try:
            exp = con.execute(oracles[name]).fetchdf()
        except Exception as e:  # noqa: BLE001
            print(f"{name:32s} ORACLE SQL ERROR: {e}")
            failures += 1
            continue
        problems = []
        if sorted(got.columns) != sorted(exp.columns):
            problems.append(f"cols {list(got.columns)} vs {list(exp.columns)}")
        elif len(got) != len(exp):
            problems.append(f"rows {len(got)} vs {len(exp)}")
        else:
            g = got[sorted(got.columns)].reset_index(drop=True)
            e = exp[sorted(exp.columns)].reset_index(drop=True)
            for c in g.columns:
                gc, ec = g[c], e[c]
                if str(gc.dtype) != str(ec.dtype):
                    problems.append(f"dtype[{c}] {gc.dtype} vs {ec.dtype}")
                try:
                    neq = (gc != ec) & ~(gc.isna() & ec.isna())
                except Exception:
                    neq = gc.astype(str) != ec.astype(str)
                if neq.any():
                    i = neq.idxmax()
                    problems.append(
                        f"val[{c}] row {i}: {gc[i]!r} vs {ec[i]!r} "
                        f"({int(neq.sum())} diffs)")
        if problems:
            failures += 1
            print(f"{name:32s} FAIL  " + "; ".join(problems[:4]))
        else:
            print(f"{name:32s} ok    ({len(got)} rows)")
    # Verify writes oracle_sql.json filtered to the queries it ran, so a
    # missing output is ALWAYS a failure (a focused dump has a focused
    # oracle file; a half-crashed full run can't hide behind one)
    missing = set(oracles) - set(names)
    if missing:
        print(f"queries with oracle but no output: {sorted(missing)}")
        failures += 1
    print(f"\n{'ALL OK' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
