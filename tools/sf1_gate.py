#!/usr/bin/env python3
"""Committed sf1 scale gate (VERDICT r10 #4).

Promotes the ad-hoc /tmp/sf1 sweep to a tracked artifact: picks the N
heaviest queries from the committed sf0.1 record (bench/latest_full.json,
falling back to bench/latest.json's metric line), benches them at sf1
(10x data via graft.StressGen), and writes bench/sf1_floor.json with the
per-query sf0.1->sf1 wall ratio. The gate FAILS (exit 1) when any query's
ratio exceeds the threshold — sublinear-or-proportional scaling under 10x
data is the invariant every round must keep.

Threshold default 3.0x at 10x data, with a 1.0 s absolute floor on the
sf1 wall (a 0.1 s query tripling to 0.3 s is scheduler noise on this
box — NOTES.md documents +-25-50% wall noise — not a scale regression).

RELAXED queries carry a 6.0x ceiling instead: the ITERATIVE family
(pagerank / label-prop / connected-component chains / trained BPE)
runs a data-independent number of rounds whose per-round fixed cost
(job setup, localCheckpoint materialization) dominates at toy scale —
measured 3.8-4.2x at 10x on a quiet box, structurally sublinear — and
the RECALL yardsticks re-run a from-scratch chain plus an exact
verification whose sample grows with the corpus. A 3.0x gate on these
flaps with the documented noise band; 6.0x still catches a real
plan-shape break (the r7 regressions this gate exists for measured
9.9-18x).

Usage: python3 tools/sf1_gate.py [--sf1 /tmp/sf1] [--top 20]
                                 [--threshold 3.0] [--skip-gen]
Run AFTER a full sf0.1 bench (bench/latest_full.json current).
"""
import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# round-structured / yardstick queries: 6.0x ceiling (see module doc).
# The closure family (q44/q183/q184/q190) left this set in r14: after
# the r13 identity-collapse + map-side-shingles shaves, all four fit
# the STANDARD 3.0x ceiling at sf1 even against the organically-
# superlinear duplicate input (SCALE.md round-13 post-shave addendum:
# q44 9.7 s, q183 9.6 s, q184 5.9 s, q190 10.9 s) — keeping them
# relaxed would let a future closure regression hide under 6.0x.
RELAXED = {
    "q81_pagerank", "q99_label_prop", "q100_dup_strip",
    "q139_lsh_recall", "q151_semantic_decontam_production_recall",
    "q170_bpe_byte_train", "q171_bpe_budget_mix",
}
RELAXED_CEILING = 6.0

# dedup/closure family: always gated (--include default) — the sf1
# generator plants a cross-copy shared-document fraction specifically
# so these queries see organically-growing dup closures (r11 #4)
DEDUP_FAMILY = ("q44_dedup_clusters,q100_dup_strip,q183_cluster_canonical,"
                "q184_leakage_safe_split,q185_split_leakage_audit")


def load_sf01():
    full = os.path.join(REPO, "bench", "latest_full.json")
    if os.path.exists(full):
        return json.load(open(full))["queries"]
    # fall back to the two-line latest.json (metric line first)
    with open(os.path.join(REPO, "bench", "latest.json")) as f:
        for line in f:
            rec = json.loads(line)
            if rec.get("metric") == "total":
                return rec["queries"]
    raise SystemExit("no committed sf0.1 bench record found")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf1", default="/tmp/sf1")
    ap.add_argument("--top", type=int, default=20)
    ap.add_argument("--threshold", type=float, default=3.0)
    ap.add_argument("--floor-sec", type=float, default=1.0)
    ap.add_argument("--skip-gen", action="store_true",
                    help="assume sf1 parquet already exists and is current")
    ap.add_argument("--include", default=DEDUP_FAMILY,
                    help="comma-separated queries always gated regardless "
                         "of sf0.1 rank (default: the dedup/closure family "
                         "— the cross-copy shared-document fraction exists "
                         "to stress exactly these, VERDICT r11 #4)")
    ap.add_argument("--chunk", type=int, default=5,
                    help="queries per Bench process. One long session "
                         "smears leftover executor state (checkpoint "
                         "blocks, GC pressure) from the closure-heavy "
                         "family onto whoever runs next — measured 4x on "
                         "q154 at sf1 in-session vs fresh — and the sf0.1 "
                         "denominators come from a differently-smeared "
                         "215-query run. Small per-process chunks bound "
                         "the contamination on the sf1 side.")
    args = ap.parse_args()

    sf01 = load_sf01()
    heaviest = sorted(((t, q) for q, t in sf01.items() if t >= 0),
                      reverse=True)[:args.top]
    names = [q for _, q in heaviest]
    for q in [x for x in args.include.split(",") if x]:
        if q not in sf01:
            print(f"[sf1-gate] WARNING: --include {q} missing from sf0.1 "
                  "record, skipped")
        elif q not in names:
            names.append(q)
    print(f"[sf1-gate] gating {len(names)} queries "
          f"(top {args.top} by sf0.1 wall + forced includes): {names}")

    if not args.skip_gen or not os.path.isdir(args.sf1):
        subprocess.run(
            ["sbt", "-batch",
             f"runMain graft.StressGen /root/testdata/sf0.1 {args.sf1}"],
            cwd=REPO, check=True)

    env = dict(os.environ, SPARK_GRAFT_SF_DIR=args.sf1,
               SPARK_GRAFT_CPUS="32", SPARK_GRAFT_REPEAT="2")
    sf1 = {}
    step = max(1, args.chunk)
    for i in range(0, len(names), step):
        group = names[i:i + step]
        subprocess.run(
            ["sbt", "-batch", "runMain graft.Bench " + " ".join(group)],
            cwd=REPO, check=True, env=env)
        with open(os.path.join(REPO, "bench", "focus.json")) as f:
            sf1.update(json.loads(f.readline())["queries"])

    rows, worst = {}, (0.0, None)
    failed = []
    for q in names:
        a, b = sf01[q], sf1.get(q, -1.0)
        ratio = (b / a) if (a > 0 and b >= 0) else float("inf")
        ceil = RELAXED_CEILING if q in RELAXED else args.threshold
        ok = b >= 0 and (ratio <= ceil or b <= args.floor_sec)
        rows[q] = {"sf01_sec": round(a, 3), "sf1_sec": round(b, 3),
                   "ratio": round(ratio, 2), "ceiling": ceil, "pass": ok}
        if not ok:
            failed.append(q)
        if ratio > worst[0] and b > args.floor_sec:
            worst = (ratio, q)
    out = {"sf1_dir": args.sf1, "threshold": args.threshold,
           "floor_sec": args.floor_sec, "n_queries": len(names),
           "worst_ratio": round(worst[0], 2), "worst_query": worst[1],
           "failed": failed, "queries": rows}
    path = os.path.join(REPO, "bench", "sf1_floor.json")
    json.dump(out, open(path, "w"), indent=1)
    print(f"[sf1-gate] wrote {path}; worst {worst[1]} at {worst[0]:.2f}x")
    if failed:
        print(f"[sf1-gate] FAIL: {failed}")
        sys.exit(1)
    print("[sf1-gate] PASS")


if __name__ == "__main__":
    main()
