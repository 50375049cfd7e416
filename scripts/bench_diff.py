#!/usr/bin/env python3
"""Diff two bench records (BENCH_DETAIL.json format) and ATTRIBUTE each
timing change: if a query's jobs and scan bytes are unchanged, a wall-time
swing is measurement/JIT/machine noise; if they moved, the plan changed.

Usage: python3 scripts/bench_diff.py OLD.json NEW.json [ratio_threshold]
"""
import json
import sys


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    old = json.load(open(sys.argv[1]))["queries"]
    new = json.load(open(sys.argv[2]))["queries"]
    thresh = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5

    rows = []
    for name in sorted(set(old) | set(new)):
        if name not in old:
            rows.append((name, None, new[name], "NEW"))
            continue
        if name not in new:
            rows.append((name, old[name], None, "REMOVED"))
            continue
        # record is [median, min, jobs, scan_mb] since round 5; tolerate
        # the pre-round-5 3-tuple [median, jobs, scan_mb] for old records
        def unpack(rec):
            return (rec[0], rec[-2], rec[-1], rec[1] if len(rec) == 4 else rec[0])
        os_, oj, ob, omin = unpack(old[name])
        ns, nj, nb, nmin = unpack(new[name])
        if os_ < 0 or ns < 0:
            rows.append((name, old[name], new[name], "FAILED"))
            continue
        ratio = ns / os_ if os_ > 0 else float("inf")
        if ratio < thresh and ratio > 1 / thresh:
            continue
        plan_changed = (oj != nj) or abs(ob - nb) > 1
        # min-vs-min agreement at unchanged jobs/bytes is the strongest
        # noise signal: the plan can still run as fast as it ever did
        min_ok = omin > 0 and nmin <= thresh * omin
        verdict = "PLAN CHANGED (jobs/bytes moved)" if plan_changed else \
            ("noise (identical jobs+bytes, min unchanged)" if min_ok
             else "noise (identical jobs+bytes)")
        rows.append((name, old[name], new[name], f"{ratio:.2f}x — {verdict}"))

    if not rows:
        print(f"no per-query changes beyond {thresh}x; totals are noise-level")
        return 0
    for name, o, n, verdict in rows:
        print(f"{name:36s} {str(o):24s} -> {str(n):24s} {verdict}")
    real = [r for r in rows if "PLAN CHANGED" in r[3] or r[3] in ("FAILED",)]
    print(f"\n{len(rows)} changed, {len(real)} need investigation")
    return 1 if real else 0


if __name__ == "__main__":
    sys.exit(main())
