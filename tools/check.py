#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads each <outDir>/<name>/ parquet (Spark result), runs the matching
oracle SQL from <outDir>/oracle_sql.json in DuckDB over <sfDir>'s tables,
sorts columns by name and rows by stringified value, and diffs cell by
cell. Exit 1 on any mismatch. NOT part of the engine — dev tooling only.
"""
import duckdb, sys, os, json
from decimal import Decimal

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, Decimal):
        # scale-SENSITIVE: the driver's hash distinguishes 1.5 from 1.50
        return str(v)
    if isinstance(v, list):
        return "[" + ",".join(norm(x) for x in v) + "]"
    return str(v)


def type_key(t):
    """Declared-type compare key. The driver's hash is type-sensitive
    (DECIMAL(28,2) != DECIMAL(38,2) even with identical values — round-1
    failure mode), so declared types must match exactly, modulo storage
    details that don't survive into the driver's pandas frames:
    timestamps' TZ-adjustment flag differs between Spark parquet output
    and DuckDB query results but both land as datetime64 values."""
    s = str(t)
    return "TIMESTAMP" if s.startswith("TIMESTAMP") else s


def canon(cols, rows, types):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm(r[i]) for i in order) for r in rows]
    out.sort()
    return ([cols[i] for i in order], out,
            [type_key(types[i]) for i in order])


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    failures = 0
    for name in sorted(oracle):
        pq = f"{outdir}/{name}"
        if not os.path.isdir(pq):
            print(f"FAIL {name}: no spark output dir")
            failures += 1
            continue
        got = con.sql(f"SELECT * FROM read_parquet('{pq}/*.parquet')")
        gcols, grows, gtypes = canon(got.columns, got.fetchall(), got.types)
        try:
            exp = con.sql(oracle[name])
            ecols, erows, etypes = canon(exp.columns, exp.fetchall(), exp.types)
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            failures += 1
            continue
        if gcols != ecols:
            print(f"FAIL {name}: columns {gcols} != {ecols}")
            failures += 1
            continue
        if gtypes != etypes:
            print(f"FAIL {name}: types {list(zip(gcols, gtypes))} != {list(zip(ecols, etypes))}")
            failures += 1
            continue
        if len(grows) != len(erows):
            print(f"FAIL {name}: rows {len(grows)} != {len(erows)}")
            print(f"  spark[:3]={grows[:3]}\n  duck[:3]={erows[:3]}")
            failures += 1
            continue
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(grows, erows)) if a != b]
        if bad:
            print(f"FAIL {name}: {len(bad)} differing rows; first:")
            for i, a, b in bad[:3]:
                print(f"  row {i}\n   spark={a}\n   duck ={b}")
            failures += 1
        else:
            print(f"OK   {name}: {len(grows)} rows")
    unhit = [n for n in sorted(os.listdir(outdir))
             if os.path.isdir(f"{outdir}/{n}") and n not in oracle]
    for n in unhit:
        print(f"NOTE {n}: spark output without oracle (rows-only check)")
    print(f"{'PASS' if failures == 0 else 'FAIL'}: {len(oracle) - failures}/{len(oracle)} oracle-matched")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
