#!/usr/bin/env python3
"""Latency-ONLY oracle guard (VERDICT r11 #8): run every registered
DuckDB oracle against an sf dir and fail if any exceeds the wall-clock
budget — no Spark outputs needed, so this runs in ~1 minute before
artifacts are handed to the driver.

The full compare (check_verify.py) enforces the same budget; this
script exists so the latency class of failure is catchable WITHOUT
first paying the ~5-minute graft.Verify dump. The oracle_sql.json it
needs is written by Verify even when the query filter matches nothing:

  sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/ob __none__"
  python3 scripts/oracle_budget.py /tmp/ob /root/testdata/sf0.01

Budget: ORACLE_BUDGET_SEC (default 10 s, same as check_verify.py).
Exit 1 if any oracle errors or busts the budget.
"""
import sys, json, time, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

BUDGET_SEC = float(os.environ.get("ORACLE_BUDGET_SEC", "10"))


def main():
    outdir, sfdir = sys.argv[1], sys.argv[2]
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    n_fail = 0
    total = 0.0
    for name, sql in sorted(oracle.items()):
        t0 = time.monotonic()
        try:
            n = len(con.execute(sql).fetchall())
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        sec = time.monotonic() - t0
        total += sec
        if sec > BUDGET_SEC:
            print(f"FAIL {name}: {sec:.1f}s > budget {BUDGET_SEC:.0f}s ({n} rows)")
            n_fail += 1
        else:
            print(f"ok   {name}: {sec:.2f}s ({n} rows)")
    print(f"== {len(oracle) - n_fail} within budget / {n_fail} over; "
          f"total {total:.1f}s")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
