#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: python3 scripts/check_verify.py <verify_out_dir> <sf_dir>

Reads each <out_dir>/<name>/ parquet written by graft.Verify, runs the
matching oracle SQL from oracle_sql.json in DuckDB against <sf_dir>'s
tables, and compares: schema (column names), row count, and values
(columns sorted by name, rows sorted by all columns, exact match after
stringify; floats also reported with approx tolerance so we can tell a
formatting mismatch from a real numeric divergence).

Every oracle also runs under a wall-clock BUDGET (default 10 s,
override with ORACLE_BUDGET_SEC): an oracle that exceeds it FAILS the
check even when its rows match. This is the guard the round-11 gate
lacked — q_pagerank's un-materialized CTE chain took 468 s in DuckDB
(rows correct!) and timed out the driver's whole correctness harvest
to {}. A latency bomb must die here, at build time, not at round end.
"""
import sys, json, glob, time, os
import duckdb
import pandas as pd
import numpy as np

BUDGET_SEC = float(os.environ.get("ORACLE_BUDGET_SEC", "10"))

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def main():
    outdir, sfdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    if only is not None:
        oracle = {k: v for k, v in oracle.items() if k in only}
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        files = sorted(glob.glob(f"{outdir}/{name}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            a = norm(pd.concat([pd.read_parquet(f) for f in files]))
            t0 = time.monotonic()
            b = norm(con.execute(sql).fetchdf())
            oracle_sec = time.monotonic() - t0
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        probs = []
        if oracle_sec > BUDGET_SEC:
            probs.append(
                f"ORACLE LATENCY {oracle_sec:.1f}s > budget {BUDGET_SEC:.0f}s "
                f"(multi-referenced CTE needing AS MATERIALIZED?)")
        if list(a.columns) != list(b.columns):
            probs.append(f"columns spark={list(a.columns)} duck={list(b.columns)}")
        elif len(a) != len(b):
            probs.append(f"rows spark={len(a)} duck={len(b)}")
        else:
            for col in a.columns:
                av, bv = a[col].to_numpy(), b[col].to_numpy()
                # The driver hashes STRINGIFIED values, so a dtype
                # divergence (e.g. DuckDB SUM(BIGINT)->HUGEINT which
                # pandas renders as float64 "99111.0" vs Spark's int64
                # "99111") is a real gate failure even when the values
                # are numerically identical. String equality is the
                # authority here; numeric closeness is diagnostic only.
                ka, kb = av.dtype.kind, bv.dtype.kind
                if ka != kb and {ka, kb} <= {"i", "u", "f"}:
                    probs.append(
                        f"col {col}: dtype kind mismatch spark={av.dtype} "
                        f"duck={bv.dtype} (driver hashes stringified values "
                        f"-- add CAST(... AS BIGINT) in the oracle?)")
                    continue
                # normalize null encodings (None / nan / NaT / <NA>)
                # before stringify so null spelling can't false-fail
                sa = a[col].where(a[col].notna(), None).astype(str).to_numpy()
                sb = b[col].where(b[col].notna(), None).astype(str).to_numpy()
                if not np.array_equal(sa, sb):
                    i = int(np.argmax(sa != sb))
                    msg = f"col {col}: row {i}: {sa[i]!r} vs {sb[i]!r}"
                    if ka == "f" and kb == "f":
                        close = np.allclose(av.astype(float), bv.astype(float),
                                            rtol=1e-9, atol=1e-12, equal_nan=True)
                        msg += f" (floats numerically close={close})"
                    probs.append(msg)
        if probs:
            print(f"FAIL {name}: " + "; ".join(probs[:3]))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(a)} rows, oracle {oracle_sec:.2f}s)")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
