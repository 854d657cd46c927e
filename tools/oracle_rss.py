#!/usr/bin/env python3
"""Peak-RSS meter for oracle SQLs (dev tool only).

Usage: oracle_rss.py <sfDir> <verifyOutDir> [names...]
       oracle_rss.py --cumulative <sfDir> <verifyOutDir> [budgetMB]

With budgetMB (default 900), cumulative mode also FAILS when the
suite high-water exceeds the budget — the per-round regression gate
that keeps the r8 OOM class from silently returning as the query
surface grows (r9 measured 789 MB for 330 oracles under the 500 MB
DuckDB internal cap; the budget leaves fragmentation margin).

Default mode forks one child process per oracle SQL (fresh allocator,
the best-case envelope the driver can see), runs it under DuckDB with
the same 500 MB memory_limit the driver uses, and reports the child's
peak RSS from getrusage. Names default to every q_ann_* in
oracle_sql.json.

--cumulative is the driver-shaped WORST case: every oracle in sorted
order through ONE process and ONE long-lived connection (allocator
fragmentation accumulates across the loop — the r8 failure mode), and
reports failures plus the process high-water.
"""
import json
import os
import resource
import sys


def run_one(sfdir, sql):
    import duckdb
    con = duckdb.connect()
    con.execute("SET memory_limit='500MB'")
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    rows = con.execute(sql).fetchall()
    return len(rows)


def cumulative(sfdir, outdir, budget_mb=900.0):
    import duckdb
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    con = duckdb.connect()
    con.execute("SET memory_limit='500MB'")
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    fails = []
    for name in sorted(oracle):
        try:
            con.execute(oracle[name]).fetchall()
        except Exception as e:
            fails.append((name, f"{e}"[:80]))
    peak = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024
    over = peak > budget_mb
    print(f"{len(oracle)} oracles, {len(fails)} failures, "
          f"high-water RSS {peak:.0f}MB (budget {budget_mb:.0f}MB"
          f"{' EXCEEDED' if over else ''})")
    for name, err in fails:
        print(f"FAIL {name}: {err}")
    sys.exit(1 if fails or over else 0)


def main():
    if sys.argv[1] == "--cumulative":
        budget = float(sys.argv[4]) if len(sys.argv) > 4 else 900.0
        cumulative(sys.argv[2], sys.argv[3], budget)
        return
    sfdir, outdir = sys.argv[1], sys.argv[2]
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    names = sys.argv[3:] or sorted(n for n in oracle if n.startswith("q_ann"))
    for name in names:
        if name not in oracle:
            print(f"{name}: not in oracle_sql.json")
            continue
        r, w = os.pipe()
        pid = os.fork()
        if pid == 0:
            os.close(r)
            try:
                n = run_one(sfdir, oracle[name])
                msg = f"ok {n}"
            except Exception as e:
                msg = f"err {type(e).__name__}: {e}"[:200]
            peak = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
            os.write(w, f"{msg} peakRSS={peak / 1024:.0f}MB".encode())
            os._exit(0)
        os.close(w)
        out = b""
        while True:
            chunk = os.read(r, 4096)
            if not chunk:
                break
            out += chunk
        os.close(r)
        os.waitpid(pid, 0)
        print(f"{name}: {out.decode()}")


if __name__ == "__main__":
    main()
