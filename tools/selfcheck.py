#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/selfcheck.py [sfDir] [outDir] [only_prefix]

Reads outDir/<name>/*.parquet (written by graft.Verify) and
outDir/oracle_sql.json, runs each oracle against DuckDB views named
after the tables in sfDir, and diffs values column-by-column with
columns sorted by name (same normalization the driver applies).
Exits nonzero on any mismatch.
"""
import duckdb, sys, json, math, os, glob

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision
    return repr(v)

def main():
    sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"
    only = sys.argv[3] if len(sys.argv) > 3 else ""
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        if only and not name.startswith(only):
            continue
        sql = oracle[name]
        files = sorted(glob.glob(f"{outdir}/{name}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet({files!r})").fetchall()
            gcols = [d[0] for d in con.description]
            want = con.execute(sql).fetchall()
            wcols = [d[0] for d in con.description]
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}")
            n_fail += 1
            continue
        # driver sorts columns by name before hashing
        gidx = sorted(range(len(gcols)), key=lambda i: gcols[i])
        widx = sorted(range(len(wcols)), key=lambda i: wcols[i])
        if sorted(gcols) != sorted(wcols):
            print(f"FAIL {name}: columns {sorted(gcols)} != {sorted(wcols)}")
            n_fail += 1
            continue
        grows = [tuple(norm(r[i]) for i in gidx) for r in got]
        wrows = [tuple(norm(r[i]) for i in widx) for r in want]
        if grows == wrows:
            n_pass += 1
            print(f"ok   {name} ({len(grows)} rows)")
        else:
            n_fail += 1
            if len(grows) != len(wrows):
                print(f"FAIL {name}: {len(grows)} rows vs oracle {len(wrows)}")
            else:
                bad = [(i, a, b) for i, (a, b) in
                       enumerate(zip(grows, wrows)) if a != b][:3]
                print(f"FAIL {name}: {len(bad)}+ differing rows, first:")
                for i, a, b in bad:
                    print(f"  row {i}:\n    spark : {a}\n    oracle: {b}")
                print(f"  cols(sorted): {sorted(gcols)}")
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

main()
