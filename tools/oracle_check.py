#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (dev tool only — the
engine itself is pure Scala/Spark; this script is never shipped).

Usage: oracle_check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify),
runs the matching SQL from oracle_sql.json in DuckDB over the sfDir
tables, and compares order-insensitively: columns sorted by name, rows
sorted by all columns, values stringified. Prints PASS/FAIL per query.
"""
import glob
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# Types that round-trip identically through every plausible driver
# canonicalization (fetchall/str, pandas, pyarrow). Anything else —
# HUGEINT (DuckDB sum(BIGINT)!), DECIMAL, FLOAT (float32 formatting),
# unsigned ints, TIME, INTERVAL — has bitten or could bite the driver's
# hash compare even when the local str() compare passes, so flag it.
SAFE_TYPES = {"BIGINT", "INTEGER", "SMALLINT", "TINYINT", "DOUBLE",
              "VARCHAR", "BOOLEAN", "DATE", "TIMESTAMP"}


def risky_types(con, sql):
    """Column (name, type) pairs whose DuckDB type isn't hash-safe."""
    desc = con.execute(f"DESCRIBE {sql}").fetchall()
    bad = []
    for name, typ, *_ in desc:
        base = typ.split("(")[0].strip()
        if base.endswith("[]"):
            base = base[:-2]
        if base not in SAFE_TYPES:
            bad.append((name, typ))
    return bad


def canon(rows, cols):
    """Order-insensitive canonical form: sort columns by name, then rows."""
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in idx:
            v = r[i]
            if isinstance(v, float):
                vals.append("%.10g" % v if not math.isnan(v) else "nan")
            elif v is None:
                vals.append("\x00NULL")
            else:
                vals.append(str(v))
        out.append(tuple(vals))
    out.sort()
    return [cols[i] for i in idx], out


def fresh_con(sfdir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    return con


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    # one connection per QUERY: a single long-lived connection
    # accumulates allocator fragmentation over ~200 queries and starts
    # failing tiny block allocations with >100 GB free (every such
    # "fail" passed when re-run alone — see BENCH_NOTES.md); closing
    # the connection resets the allocator and removes the flake
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        files = sorted(glob.glob(f"{outdir}/{name}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        con = fresh_con(sfdir)
        try:
            mine = con.execute(
                f"SELECT * FROM read_parquet({files!r})").fetchall()
            mine_cols = [d[0] for d in con.description]
            ref = con.execute(oracle[name]).fetchall()
            ref_cols = [d[0] for d in con.description]
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            con.close()
            continue
        for side, sql in (("spark", f"SELECT * FROM read_parquet({files!r})"),
                          ("oracle", oracle[name])):
            for cname, typ in risky_types(con, sql):
                print(f"WARN {name}: {side} column {cname} has "
                      f"hash-risky type {typ}")
        mc, mr = canon(mine, mine_cols)
        rc, rr = canon(ref, ref_cols)
        if mc != rc:
            print(f"FAIL {name}: columns {mc} vs {rc}")
            n_fail += 1
        elif mr != rr:
            n_fail += 1
            diff = [(a, b) for a, b in zip(mr, rr) if a != b][:3]
            extra_m = [r for r in mr if r not in set(rr)][:3]
            extra_r = [r for r in rr if r not in set(mr)][:3]
            print(f"FAIL {name}: {len(mr)} vs {len(rr)} rows; "
                  f"first diffs {diff or (extra_m, extra_r)}")
        else:
            n_pass += 1
            print(f"PASS {name} ({len(mr)} rows)")
        con.close()
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
