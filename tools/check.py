#!/usr/bin/env python3
"""Local driver-mimic correctness check.

Runs after `sbt "runMain graft.Verify <sfDir> <outDir>"`: loads each
query's Spark parquet output and its DuckDB oracle result, sorts both by
all columns, and compares exactly (floats: exact bitwise via repr, with a
1e-12-relative fallback report so near-misses are visible).

Usage: python3 tools/check.py <sfDir> <outDir>
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        return v
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, norm(x)) for k, x in v.items()))
    return v


def rows_key(rows):
    return sorted([tuple(norm(v) for v in r) for r in rows],
                  key=lambda t: tuple((x is None, str(x)) for x in t))


def cmp_rows(a, b):
    """Return (exact_match, near_match)."""
    if len(a) != len(b):
        return False, False
    exact = True
    for ra, rb in zip(a, b):
        if len(ra) != len(rb):
            return False, False
        for va, vb in zip(ra, rb):
            if va == vb:
                continue
            if isinstance(va, float) and isinstance(vb, float):
                if math.isclose(va, vb, rel_tol=1e-12, abs_tol=1e-12):
                    exact = False
                    continue
            return False, False
    return exact, True


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    for name, sql in sorted(oracle.items()):
        try:
            got_rel = con.sql(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            got_cols = sorted(got_rel.columns)
            got = con.sql(
                "SELECT " + ", ".join(f'"{c}"' for c in got_cols)
                + f" FROM read_parquet('{out_dir}/{name}/*.parquet')").fetchall()
        except Exception as e:
            results[name] = f"SPARK-OUTPUT-MISSING: {e}"
            continue
        try:
            want_rel = con.sql(sql)
            want_cols = sorted(want_rel.columns)
            idx = [want_rel.columns.index(c) for c in want_cols]
            want = [tuple(r[i] for i in idx) for r in want_rel.fetchall()]
        except Exception as e:
            results[name] = f"ORACLE-SQL-ERROR: {e}"
            continue
        if got_cols != want_cols:
            results[name] = f"SCHEMA-MISMATCH: spark={got_cols} duck={want_cols}"
            continue
        ga, wa = rows_key(got), rows_key(want)
        exact, near = cmp_rows(ga, wa)
        raw_got = [tuple(norm(v) for v in r) for r in got]
        raw_want = [tuple(norm(v) for v in r) for r in want]
        order_ok = "+order" if raw_got == raw_want else "UNSORTED-DIFF"
        if exact:
            results[name] = f"OK ({len(ga)} rows, {order_ok})"
        elif near:
            results[name] = f"NEAR (float-only diff, {len(ga)} rows)"
        else:
            diff = [i for i, (x, y) in enumerate(zip(ga, wa)) if x != y][:3]
            detail = "; ".join(
                f"row{i}: spark={ga[i]} duck={wa[i]}" for i in diff) \
                if len(ga) == len(wa) else f"rowcount spark={len(ga)} duck={len(wa)}"
            results[name] = f"MISMATCH: {detail[:500]}"
    bad = 0
    for name, r in sorted(results.items()):
        flag = "PASS" if r.startswith("OK") else (
            "NEAR" if r.startswith("NEAR") else "FAIL")
        if flag == "FAIL":
            bad += 1
        print(f"{flag:5} {name}: {r}")
    print(f"\n{len(results) - bad}/{len(results)} pass")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
