#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB differential check.

Usage: compare.py <sfDir> <verifyOutDir>

For each query directory under verifyOutDir, loads the Spark result
parquet, runs the matching oracle SQL (oracle_sql.json) in DuckDB with
every testdata table registered as a view, sorts columns by name, and
compares row counts + cell values EXACTLY (the driver hash-compares,
so floats must match bit-for-bit — round identically on both sides).
Queries without an oracle get a rows-only check; queries listed in
queries.json but missing an output directory are failures.
"""
import json
import math
import sys

import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracles = json.load(open(f"{outdir}/oracle_sql.json"))

import os
fails = []
declared = []
manifest = os.path.join(outdir, "queries.json")
partial = os.path.join(outdir, "queries_partial.json")
if os.path.exists(manifest):
    declared = json.load(open(manifest))
elif os.path.exists(partial):
    declared = json.load(open(partial))
    print(f"PARTIAL RUN ({len(declared)} filtered queries) — NOT a full gate")
for name in declared:
    if not os.path.isdir(os.path.join(outdir, name)):
        print(f"{name:24s} MISSING OUTPUT (query threw?)")
        fails.append(name)
# compare ONLY the declared set when a manifest exists: a reused
# outDir may hold stale dirs from an earlier (full or filtered) run,
# and judging those against the current oracles silently mixes runs
names = declared if declared else sorted(os.listdir(outdir))
for name in names:
    d = os.path.join(outdir, name)
    if not os.path.isdir(d):
        continue
    spark = con.sql(f"SELECT * FROM '{d}/*.parquet'")
    scols = sorted(spark.columns)
    sdf = spark.df()[scols]
    if name not in oracles:
        print(f"{name:24s} rows-only: {len(sdf)} rows "
              f"{'OK' if len(sdf) > 0 else 'EMPTY!'}")
        if len(sdf) == 0:
            fails.append(name)
        continue
    try:
        oracle = con.sql(oracles[name])
        ocols = sorted(oracle.columns)
        odf = oracle.df()[ocols]
    except Exception as e:
        print(f"{name:24s} ORACLE ERROR: {e}")
        fails.append(name)
        continue
    ok = True
    if scols != ocols:
        print(f"{name:24s} COLUMN MISMATCH spark={scols} oracle={ocols}")
        ok = False
    elif len(sdf) != len(odf):
        print(f"{name:24s} ROWCOUNT spark={len(sdf)} oracle={len(odf)}")
        ok = False
    else:
        import numpy as np
        for c in scols:
            # the driver's hash gate is dtype-sensitive: int64 vs
            # float64 (e.g. DuckDB HUGEINT -> pandas float64) hashes
            # differently even when values compare ==, so mismatched
            # numeric kinds must fail HERE too, not just on the driver
            sd, od = sdf[c].dtype, odf[c].dtype
            s_num = np.issubdtype(sd, np.number)
            o_num = np.issubdtype(od, np.number)
            if s_num != o_num or (s_num and o_num and
                    np.issubdtype(sd, np.floating)
                    != np.issubdtype(od, np.floating)):
                print(f"{name:24s} DTYPE col {c}: spark={sd} oracle={od}")
                ok = False
                break
            a, b = sdf[c].tolist(), odf[c].tolist()
            for i, (x, y) in enumerate(zip(a, b)):
                # EXACT float equality: the driver hash-compares
                # values, so a 1e-12 float drift that a tolerance
                # would forgive still fails the real gate. Every
                # oracle-facing float must be round()ed identically
                # on both sides (verified bit-exact 2026-08-12).
                # str() fallback only for NON-numeric cells (dates,
                # decimals) — for numerics it would mask int/float
                # representation drift the driver catches.
                same = (x == y or (x is None and y is None)
                        or (isinstance(x, float) and isinstance(y, float)
                            and math.isnan(x) and math.isnan(y))
                        or (not s_num and str(x) == str(y)))
                if not same:
                    print(f"{name:24s} VALUE row {i} col {c}: "
                          f"spark={x!r} oracle={y!r}")
                    ok = False
                    break
            if not ok:
                break
    if ok:
        print(f"{name:24s} OK ({len(sdf)} rows)")
    else:
        fails.append(name)

print(f"\n{'ALL OK' if not fails else 'FAILURES: ' + ', '.join(fails)}")
sys.exit(1 if fails else 0)
