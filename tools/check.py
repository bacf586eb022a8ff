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
    # Optional --json=PATH anywhere in argv: also write a driver-format
    # correctness record (name -> rows/schema/hash entries, plus a
    # _meta block with the dump's git SHA) so an at-HEAD run can be
    # COMMITTED as the in-tree record (VERDICT r12 #1 — two rounds of
    # driver artifacts were stale relative to HEAD).
    json_out = None
    args = []
    for a in sys.argv[1:]:
        if a.startswith("--json="):
            json_out = a.split("=", 1)[1]
        else:
            args.append(a)
    sfdir, outdir = args[0], args[1]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    # Echo the dump's git SHA (written by Verify) so a correctness
    # record is attributable to its exact commit.
    sha = "unknown"
    try:
        with open(f"{outdir}/git_sha.txt") as f:
            sha = f.read().strip()
            print(f"dump git sha: {sha}")
    except OSError:
        pass
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    # Optional 3rd arg: comma-separated query-name prefixes to check
    # (pairs with Verify's SPARK_GRAFT_ONLY dev filter).
    only = args[2].split(",") if len(args) > 2 else None
    record = {}
    n_pass = n_fail = 0
    for name in sorted(oracle):
        if only and not any(name.startswith(p) for p in only):
            continue
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        def ent(rows=False, schema=False, hashm=False, sr=None, orr=None,
                err=None):
            record[name] = {"rows_match": rows, "schema_match": schema,
                            "hash_match": hashm, "spark_rows": sr,
                            "oracle_rows": orr, "err": err}
        if not files:
            print(f"FAIL {name}: no spark output")
            ent(err="no spark output")
            n_fail += 1
            continue
        try:
            got = canon(con.execute(
                f"SELECT * FROM read_parquet({files!r})").df())
            exp = canon(con.execute(oracle[name]).df())
        except Exception as e:
            print(f"FAIL {name}: {e}")
            ent(err=str(e))
            n_fail += 1
            continue
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(exp.columns)}")
            ent(rows=len(got) == len(exp), sr=len(got), orr=len(exp),
                err="schema mismatch")
            n_fail += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} != {len(exp)}")
            ent(schema=True, sr=len(got), orr=len(exp))
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
            ent(rows=True, schema=True, sr=len(got), orr=len(exp),
                err=f"row {bad[0]} col {bad[1]}: spark={bad[2]!r} oracle={bad[3]!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            ent(rows=True, schema=True, hashm=True, sr=len(got),
                orr=len(exp))
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    if json_out:
        out = {"_meta": {"git_sha": sha, "pass": n_pass, "fail": n_fail,
                         "sf": sfdir}}
        out.update({k: record[k] for k in sorted(record)})
        with open(json_out, "w") as f:
            json.dump(out, f, indent=1)
        print(f"record written: {json_out}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
