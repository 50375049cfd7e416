#!/usr/bin/env python3
"""Merge the round-14 scale runs into BENCH_SF100.json + a ratio report.

Inputs (written by scripts/scale_r14_phaseB.sh / scale_r14_phaseA.sh):
  target/scale_r14/bench_sf100_core.json   q93 + medallion trio at sf100
  target/scale_r14/bench_sf100_q97.json    q97 at sf100
  target/scale_r14/bench_sf1.json          q93/q97/q266 at sf1
  target/scale_r14/bench_sf10.json         q93/q97/q266 at sf10
  target/scale_r14/ramp_sf1.json           banded-family ramps at sf1
  target/scale_r14/ramp_sf10.json          banded-family ramps at sf10

Output: BENCH_SF100.json at the repo root (committed record) and a
stdout table of sf1->sf10 and sf10->sf100 ratios for SCALE.md.
"""
import json
import os
import sys

D = "target/scale_r14"


def load(name):
    p = os.path.join(D, name)
    if not os.path.exists(p) or os.path.getsize(p) == 0:
        return None
    with open(p) as f:
        # Bench prints three JSON lines (named map / numeric map /
        # summary); the FIRST carries the name -> record map
        return json.loads(f.read().strip().splitlines()[0])


def queries(rec):
    if rec is None:
        return {}
    q = dict(rec.get("queries", {}))
    # fold in untimed split metrics (index/store builds, canary)
    for k, v in rec.items():
        if k.endswith("_sec") and isinstance(v, (int, float)):
            q[k] = v
    return q


def med(v):
    # per-query record is [median_sec, min_sec, jobs, scan_mb] or a scalar
    return v[0] if isinstance(v, list) else v


def mn(v):
    return v[1] if isinstance(v, list) else v


core = load("bench_sf100_core.json")
q97r = load("bench_sf100_q97.json")
sf1 = {**queries(load("bench_sf1.json")), **queries(load("ramp_sf1.json"))}
sf10 = {**queries(load("bench_sf10.json")), **queries(load("ramp_sf10.json"))}
sf100 = {**queries(core), **queries(q97r)}

solo10 = {**queries(load("q93solo_sf10.json")), **queries(load("q97solo_sf10.json"))}

if core is not None:
    out = {
        "sf": "sf100-chained (GenSf sf10 x10: ~16 GB, 600M lineitem / 100M events / 5M documents)",
        "reps": core.get("reps"),
        "queries": {k: v for k, v in {**queries(core), **queries(q97r)}.items()},
        "sf10_dedicated_same_day": solo10 or None,
        "note": "3 reps, stage splits skipped; embedding near-dup queries excluded "
                "by construction (chained rotation collisions, see SCALE.md). "
                "Records are [median_sec, min_sec, jobs, scan_mb]; *_sec keys are "
                "untimed preparation splits. A NEGATIVE median marks a query with "
                "a failed rep (q93/q60: one rep each hit the sandbox's 62 GB free-"
                "disk ceiling mid-shuffle; the min_sec rep is valid). "
                "sf10_dedicated_same_day holds the single-query sf10 runs taken "
                "the same session for ratio pairing (shared-JVM multi-query runs "
                "contaminate walls ~3x; see SCALE.md round-14).",
    }
    with open("BENCH_SF100.json", "w") as f:
        json.dump(out, f, indent=1)
    print("wrote BENCH_SF100.json")

print(f"\n{'query':<28}{'sf1':>9}{'sf10':>9}{'sf100':>9}{'1->10':>8}{'10->100':>9}{'minmin':>9}")
for k in sorted(set(sf1) | set(sf10) | set(sf100)):
    a, b, c = sf1.get(k), sf10.get(k), sf100.get(k)
    f1 = f"{med(b)/med(a):.1f}x" if a and b and med(a) else ""
    f2 = f"{med(c)/med(b):.1f}x" if b and c and med(b) else ""
    f3 = f"{mn(c)/mn(b):.1f}x" if b and c and isinstance(b, list) and isinstance(c, list) and mn(b) else ""
    fmt = lambda v: f"{med(v):.2f}" if v is not None else ""
    print(f"{k:<28}{fmt(a):>9}{fmt(b):>9}{fmt(c):>9}{f1:>8}{f2:>9}{f3:>9}")
