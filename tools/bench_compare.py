#!/usr/bin/env python3
"""Compare two Bench JSON outputs (or raw log files containing the
metric line): per-query ratios, sorted by regression, with totals.

Usage: bench_compare.py OLD NEW [threshold]
Accepts either a BENCH_r*.json driver artifact ({"parsed": {...}} or the
raw line) or a log file whose last metric line has "queries".
"""
import json
import re
import sys


def load(path):
    txt = open(path).read()
    # try whole-file json first (driver artifact)
    try:
        d = json.loads(txt)
        if isinstance(d, dict):
            if "queries" in d:
                return d["queries"]
            if isinstance(d.get("parsed"), dict) and "queries" in d["parsed"]:
                return d["parsed"]["queries"]
    except json.JSONDecodeError:
        pass
    # fall back: last {"metric":"total"...} line in a log
    qs = None
    for m in re.finditer(r'\{"metric":"total".*\}', txt):
        try:
            qs = json.loads(m.group(0)).get("queries")
        except json.JSONDecodeError:
            continue
    if qs is None:
        raise SystemExit(f"no bench metric line with queries in {path}")
    return qs


def main():
    old, new = load(sys.argv[1]), load(sys.argv[2])
    thr = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    shared = sorted(set(old) & set(new))
    rows = [(new[q] / old[q] if old[q] > 0 else float("inf"), q,
             old[q], new[q]) for q in shared]
    rows.sort(reverse=True)
    print(f"{'ratio':>7} {'old_s':>8} {'new_s':>8}  query")
    for r, q, o, n in rows:
        flag = " <-- " if (r >= thr and n > 0.5) else ""
        print(f"{r:7.2f} {o:8.2f} {n:8.2f}  {q}{flag}")
    to, tn = sum(old[q] for q in shared), sum(new[q] for q in shared)
    print(f"\nshared {len(shared)} queries: old {to:.1f}s new {tn:.1f}s "
          f"ratio {tn / to:.2f}")
    only_old = set(old) - set(new)
    only_new = set(new) - set(old)
    if only_old:
        print("only in OLD:", ", ".join(sorted(only_old)))
    if only_new:
        print("only in NEW:", ", ".join(sorted(only_new)))


if __name__ == "__main__":
    main()
