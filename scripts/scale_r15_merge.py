#!/usr/bin/env python3
"""Merge the round-15 sf100 re-cut into BENCH_SF100.json + a ratio report.

Inputs (every file is a bench/ramp stdout capture; the JSON record line is
found by KEY PRESENCE — the line whose object carries "queries" — not by
position, so wrapped or reordered output fails loudly instead of
misparsing):
  target/scale_r15/bench_sf100_core.json   q93 + q60/q61/q62 at sf100
  target/scale_r15/bench_sf100_q97.json    q97 at sf100 (separate run)
  target/scale_r15/q93solo_sf10.json       dedicated same-day sf10 q93
  target/scale_r15/q97solo_sf10.json       dedicated same-day sf10 q97

Output: BENCH_SF100.json at the repo root. Failed reps are recorded as a
NULL median plus an explicit entry in "partial_queries" (round-14 ADVICE:
the old negative-median sentinel poisoned downstream arithmetic); ratios
for partial queries are printed as min-vs-min only.
"""
import json
import os

D = "target/scale_r15"


def load(name):
    p = os.path.join(D, name)
    if not os.path.exists(p) or os.path.getsize(p) == 0:
        return None
    with open(p) as f:
        for line in f.read().strip().splitlines():
            try:
                rec = json.loads(line)
            except ValueError:
                continue
            if isinstance(rec, dict) and "queries" in rec:
                return rec
    raise SystemExit(f"{p}: no line carries a 'queries' record")


def queries(rec):
    if rec is None:
        return {}
    q = dict(rec.get("queries", {}))
    for k, v in rec.items():
        if k.endswith("_sec") and isinstance(v, (int, float)):
            q[k] = v
    return q


def split_partials(qmap):
    """Bench/ScaleRamp wire format marks a failed rep by negating the
    median; translate to null-median + an explicit partial marker."""
    out, partial = {}, {}
    for k, v in qmap.items():
        if isinstance(v, list) and v and isinstance(v[0], (int, float)) and v[0] < 0:
            out[k] = [None] + v[1:]
            partial[k] = "failed rep (see run stderr); min_sec is the valid rep"
        else:
            out[k] = v
    return out, partial


def med(v):
    return v[0] if isinstance(v, list) else v


def mn(v):
    return v[1] if isinstance(v, list) else v


core = load("bench_sf100_core.json")
q97r = load("bench_sf100_q97.json")
solo10 = {**queries(load("q93solo_sf10.json")), **queries(load("q97solo_sf10.json"))}
sf100_raw = {**queries(core), **queries(q97r)}
# A dedicated q93 sf100 re-run supersedes the core-run q93 when present
# (round 16: the core run's q93 rep died on a disk ceiling created by
# ~12 GB of ORPHANED blockmgr scratch from earlier unrelated JVMs; the
# re-run executes on a cleaned disk — an environment fix, not cherry-
# picking, and the superseded core numbers stay in the core capture).
q93re = load("bench_sf100_q93re.json")
if q93re is not None:
    for k, v in queries(q93re).items():
        if k.startswith("q93") or k == "host_canary_sec":
            sf100_raw[k] = v
sf100, partial = split_partials(sf100_raw)

if core is not None:
    out = {
        "sf": "sf100-chained (GenSf sf10 x10: ~16 GB, 600M lineitem / 100M events / 5M documents)",
        "reps": core.get("reps"),
        "queries": sf100,
        "partial_queries": partial,
        "sf10_dedicated_same_day": solo10 or None,
        "note": "3 reps, stage splits skipped; embedding near-dup queries excluded "
                "by construction (chained rotation collisions, see SCALE.md). "
                "Records are [median_sec, min_sec, jobs, scan_mb]; *_sec keys are "
                "untimed preparation splits. A query with any failed rep has a "
                "NULL median and an entry in partial_queries (its min_sec rep is "
                "valid). sf10_dedicated_same_day holds the single-query sf10 runs "
                "taken the same session for ratio pairing (shared-JVM multi-query "
                "runs contaminate walls ~3x; see SCALE.md round-14). Round-15 "
                "re-cut under the zstd shuffle codec default.",
    }
    with open("BENCH_SF100.json", "w") as f:
        json.dump(out, f, indent=1)
    print("wrote BENCH_SF100.json" + (f" (partial: {sorted(partial)})" if partial else " (all reps clean)"))

print(f"\n{'query':<28}{'sf10':>9}{'sf100':>9}{'10->100 med':>12}{'minmin':>9}")
for k in sorted(set(solo10) | set(sf100)):
    b, c = solo10.get(k), sf100.get(k)
    f2 = f3 = ""
    if isinstance(b, list) and isinstance(c, list):
        if med(b) and med(c):
            f2 = f"{med(c)/med(b):.1f}x"
        if mn(b) and mn(c):
            f3 = f"{mn(c)/mn(b):.1f}x"
    fmt = lambda v: f"{med(v):.2f}" if isinstance(v, list) and med(v) is not None \
        else (f"{v:.2f}" if isinstance(v, (int, float)) else "")
    print(f"{k:<28}{fmt(b):>9}{fmt(c):>9}{f2:>12}{f3:>9}")
