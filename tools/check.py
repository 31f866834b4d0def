#!/usr/bin/env python3
"""Local pre-verification mimicking the driver's DuckDB-oracle compare.

Usage:
  sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/graft_verify"
  python3 tools/check.py [/root/testdata/sf0.01] [/tmp/graft_verify]

For each query dir under outDir: load the Spark parquet result, run the
matching oracle SQL from oracle_sql.json in DuckDB over views of the sf
tables, sort columns by name, and compare cell-by-cell (exact for
ints/strings, 1e-9 rel tolerance for floats — flagged, since the driver
may hash exactly).
"""
import json
import math
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)

    n_pass = n_fail = n_skip = 0
    for name in sorted(oracles):
        sql = oracles[name]
        try:
            spark_df = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: no spark output ({e})")
            n_fail += 1
            continue
        try:
            duck_df = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue

        s = spark_df[sorted(spark_df.columns)]
        d = duck_df[sorted(duck_df.columns)]
        if list(s.columns) != list(d.columns):
            print(f"FAIL {name}: columns {list(s.columns)} != {list(d.columns)}")
            n_fail += 1
            continue
        if len(s) != len(d):
            print(f"FAIL {name}: rows {len(s)} != {len(d)}")
            n_fail += 1
            continue
        # The driver hashes TYPED values, so a dtype mismatch (e.g. DuckDB
        # window sum() -> HUGEINT vs Spark BIGINT) fails its gate even when
        # every value compares equal. Compare numpy kinds, not exact dtypes,
        # so nullable Int64 vs int64 still passes.
        dtype_bad = [(c, str(s[c].dtype), str(d[c].dtype)) for c in s.columns
                     if s[c].dtype.kind != d[c].dtype.kind]
        if dtype_bad:
            print(f"FAIL {name}: dtype kind mismatch (driver hashes typed "
                  f"values): {dtype_bad}")
            n_fail += 1
            continue
        bad = []
        inexact = 0
        for col in s.columns:
            if len(bad) > 3:
                break
            sv, dv = s[col].tolist(), d[col].tolist()
            for i, (a, b) in enumerate(zip(sv, dv)):
                if a is None and b is None:
                    continue
                if isinstance(a, float) or isinstance(b, float):
                    fa = float("nan") if a is None else float(a)
                    fb = float("nan") if b is None else float(b)
                    if math.isnan(fa) and math.isnan(fb):
                        continue
                    if fa == fb:
                        continue
                    if math.isclose(fa, fb, rel_tol=1e-9, abs_tol=1e-9):
                        inexact += 1
                        continue
                    bad.append((col, i, a, b))
                elif a != b:
                    bad.append((col, i, a, b))
                if len(bad) > 3:
                    break
        if bad:
            print(f"FAIL {name}: {len(bad)}+ mismatches, first: {bad[:3]}")
            n_fail += 1
        elif inexact:
            # WARNING, not a clean pass: the driver hashes exactly, so
            # close-but-inexact floats can still fail the real gate.
            print(f"PASS~ {name}: {len(s)} rows ({inexact} float cells "
                  f"inexact-but-close — driver may still fail these)")
            n_pass += 1
        else:
            print(f"PASS {name}: {len(s)} rows exact")
            n_pass += 1

    # queries with no oracle entry → rows-only check
    import os
    for entry in sorted(os.listdir(out_dir)):
        p = os.path.join(out_dir, entry)
        if os.path.isdir(p) and entry not in oracles:
            rows = len(pd.read_parquet(p))
            print(f"INFO {entry}: no oracle, {rows} rows")
            n_skip += 1

    print(f"\n{n_pass} pass, {n_fail} fail, {n_skip} rows-only")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
