#!/usr/bin/env python3
"""Compose a per-query bench floor from multiple records (r14 VERDICT #1).

The committed floor must stop being one wholesale run: single-cell window
swings of up to 5x (q126 2.15 <-> 11.37 s across one day, same code) make
any ">2x regression" claim unfalsifiable when the floor is whichever full
run happened to be committed. This tool builds floor[q] = min over every
supplied record (full runs AND isolated re-floors alike), recording per
cell WHICH record supplied the minimum, so a floor cell is always
traceable to a real measured run.

Usage:
  bench_floor.py OUT.json RECORD [RECORD...]
  bench_floor.py --check FLOOR.json RECORD [ratio]

Modes:
  compose (default): floor[q] = min over records; provenance per cell.
      Records may be driver artifacts ({"queries": {...}}), raw logs
      (last {"metric":"total"...} line wins), or focus-run outputs (a
      record holding only a subset of queries contributes only those).
      Failed cells (negative seconds) never contribute.
  --check: compare a bench record against a composed floor; report
      cells above `ratio` (default 2.0) and the total-vs-floor ratio.
      Exit 1 if the total exceeds ratio x floor total on shared cells.
"""
import json
import os
import re
import sys


def load_queries(path):
    txt = open(path).read()
    try:
        d = json.loads(txt)
        if isinstance(d, dict):
            if "queries" in d:
                return d["queries"]
            if isinstance(d.get("parsed"), dict) and "queries" in d["parsed"]:
                return d["parsed"]["queries"]
            if "floor" in d:  # a composed floor also works as input
                return {q: c["sec"] for q, c in d["floor"].items()}
    except json.JSONDecodeError:
        pass
    qs = None
    for m in re.finditer(r'\{"metric":"total".*\}', txt):
        try:
            qs = json.loads(m.group(0)).get("queries", qs)
        except json.JSONDecodeError:
            continue
    if qs is None:
        raise SystemExit(f"no bench queries found in {path}")
    return qs


def compose(out_path, record_paths):
    floor = {}
    for path in record_paths:
        name = os.path.basename(path)
        for q, sec in load_queries(path).items():
            if not isinstance(sec, (int, float)) or sec < 0:
                continue  # failed cell: never a floor
            cur = floor.get(q)
            if cur is None or sec < cur["sec"]:
                floor[q] = {"sec": round(float(sec), 4), "source": name}
    total = round(sum(c["sec"] for c in floor.values()), 3)
    by_source = {}
    for c in floor.values():
        by_source[c["source"]] = by_source.get(c["source"], 0) + 1
    out = {
        "metric": "floor",
        "value": total,
        "unit": "sec",
        "n_queries": len(floor),
        "records": [os.path.basename(p) for p in record_paths],
        "cells_by_source": by_source,
        "floor": dict(sorted(floor.items())),
    }
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=False)
    print(f"floor: {len(floor)} queries, total {total}s "
          f"from {len(record_paths)} records -> {out_path}")
    for src, n in sorted(by_source.items(), key=lambda kv: -kv[1]):
        print(f"  {n:4d} cells from {src}")


def check(floor_path, record_path, ratio):
    floor_doc = json.load(open(floor_path))
    floor = {q: c["sec"] for q, c in floor_doc["floor"].items()}
    rec = load_queries(record_path)
    shared = sorted(set(floor) & set(rec))
    bad = []
    for q in shared:
        if rec[q] < 0:
            bad.append((q, rec[q], floor[q], float("inf")))
        elif floor[q] > 0 and rec[q] / floor[q] > ratio:
            bad.append((q, rec[q], floor[q], rec[q] / floor[q]))
    ft = sum(floor[q] for q in shared)
    rt = sum(rec[q] for q in shared if rec[q] >= 0)
    print(f"shared {len(shared)} cells: record {rt:.1f}s vs floor {ft:.1f}s "
          f"= {rt / ft:.2f}x" if ft else "empty floor")
    for q, r, f, x in sorted(bad, key=lambda t: -t[3]):
        print(f"  {q}: {r:.2f}s vs floor {f:.2f}s = {x:.1f}x")
    new_cells = sorted(set(rec) - set(floor))
    if new_cells:
        newt = sum(rec[q] for q in new_cells if rec[q] >= 0)
        print(f"new cells (not in floor): {len(new_cells)}, {newt:.1f}s")
    if ft and rt / ft > ratio:
        sys.exit(1)


def main():
    args = sys.argv[1:]
    if not args:
        raise SystemExit(__doc__)
    if args[0] == "--check":
        ratio = float(args[3]) if len(args) > 3 else 2.0
        check(args[1], args[2], ratio)
    else:
        compose(args[0], args[1:])


if __name__ == "__main__":
    main()
