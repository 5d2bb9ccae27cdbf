#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Usage: check_oracle.py <sfDir> <verifyOutDir>

Loads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs the
matching SQL from oracle_sql.json in DuckDB against views over <sfDir>'s
tables, sorts columns by name, and compares values exactly (reporting float
deltas when not equal).
"""
import json, os, sys
import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm(df: pd.DataFrame) -> pd.DataFrame:
    # Mirror the driver: sort COLUMNS by name, then lexsort ROWS across
    # all columns. A non-scalar cell (ndarray/list/dict) makes the row
    # sort throw — exactly like the driver's harness — so output-shape
    # traps (the round-10 vec_chunk_pool array<double> column) fail
    # locally before they fail externally.
    df = df[sorted(df.columns)]
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracle = json.load(f)
    n_pass = n_fail = 0
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    for name in names:
        try:
            got = norm(con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df())
        except Exception as e:
            print(f"[FAIL] {name}: result not harness-comparable: {e}")
            n_fail += 1
            continue
        if name not in oracle:
            print(f"[SKIP] {name}: no oracle (rows={len(got)})")
            continue
        try:
            exp = norm(con.execute(oracle[name]).df())
        except Exception as e:
            print(f"[FAIL] {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        ok = True
        msgs = []
        if list(got.columns) != list(exp.columns):
            ok = False
            msgs.append(f"columns: got {list(got.columns)} exp {list(exp.columns)}")
        elif len(got) != len(exp):
            ok = False
            msgs.append(f"rows: got {len(got)} exp {len(exp)}")
        else:
            for c in got.columns:
                g, e = got[c], exp[c]
                # The driver hashes TYPED values: int64 vs float64 diverges
                # even when every value compares equal (the round-8
                # vec_score_calibration HUGEINT artifact). Mirror that.
                if (pd.api.types.is_float_dtype(g) !=
                        pd.api.types.is_float_dtype(e)):
                    ok = False
                    msgs.append(
                        f"col {c}: dtype kind mismatch got {g.dtype} exp {e.dtype}"
                        " (driver typed hash would diverge)")
                    continue
                if pd.api.types.is_float_dtype(g) or pd.api.types.is_float_dtype(e):
                    ge = g.astype(float); ee = e.astype(float)
                    if not ((ge == ee) | (ge.isna() & ee.isna())).all():
                        ok = False
                        d = (ge - ee).abs().max()
                        msgs.append(f"col {c}: max |delta| = {d}")
                else:
                    if not (g.astype(str) == e.astype(str)).all():
                        ok = False
                        bad = (g.astype(str) != e.astype(str))
                        i = bad.idxmax()
                        msgs.append(f"col {c}: first diff row {i}: got {g[i]!r} exp {e[i]!r}")
        if ok:
            n_pass += 1
            print(f"[PASS] {name} ({len(got)} rows)")
        else:
            n_fail += 1
            print(f"[FAIL] {name}: " + "; ".join(msgs))
    print(f"== {n_pass} pass, {n_fail} fail, {len(names)} total")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
