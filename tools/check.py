#!/usr/bin/env python3
"""Local approximation of the driver's DuckDB-oracle compare.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (Spark result), runs the
matching oracle SQL from oracle_sql.json in DuckDB over <sfDir>'s
tables, sorts columns by name and rows by all values, and compares.
"""
import sys, json, glob, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def cell_eq(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    return a == b


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    # Echo the dump's git SHA (written by Verify) so a correctness
    # record is attributable to its exact commit.
    try:
        with open(f"{outdir}/git_sha.txt") as f:
            print(f"dump git sha: {f.read().strip()}")
    except OSError:
        pass
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    # Optional 3rd arg: comma-separated query-name prefixes to check
    # (pairs with Verify's SPARK_GRAFT_ONLY dev filter).
    only = sys.argv[3].split(",") if len(sys.argv) > 3 else None
    n_pass = n_fail = 0
    for name in sorted(oracle):
        if only and not any(name.startswith(p) for p in only):
            continue
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            got = canon(con.execute(
                f"SELECT * FROM read_parquet({files!r})").df())
            exp = canon(con.execute(oracle[name]).df())
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(exp.columns)}")
            n_fail += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} != {len(exp)}")
            n_fail += 1
            continue
        bad = None
        for i in range(len(got)):
            for c in got.columns:
                a, b = got[c].iloc[i], exp[c].iloc[i]
                try:
                    import numpy as np
                    if isinstance(a, np.generic):
                        a = a.item()
                    if isinstance(b, np.generic):
                        b = b.item()
                except ImportError:
                    pass
                if not cell_eq(a, b):
                    bad = (i, c, a, b)
                    break
            if bad:
                break
        if bad:
            print(f"FAIL {name}: row {bad[0]} col {bad[1]}: spark={bad[2]!r} oracle={bad[3]!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
