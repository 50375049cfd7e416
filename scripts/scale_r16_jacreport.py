#!/usr/bin/env python3
"""Ratio report for the round-16 jaccard weak-scaling same-tier pair.

Reads target/scale_r16/jacfix_sf1_8g.json + jacfix_sf10_80g.json
(ScaleRamp records: [median_sec, min_sec, jobs, scan_mb, spill_disk_mb])
and jaccand_{sf1,sf10}.txt (CANDIDATES=N, production posture), prints
wall-vs-workload growth WITH the recorded spill tier of each leg, plus
the peak concurrent scratch of the sf10 leg (jac_peak_scratch.log) and
its sf100 projection — the arithmetic behind "the literal sf100 leg
cannot run on this sandbox".
"""
import json, os, re, sys

D = "target/scale_r16"

def ramp(name):
    p = os.path.join(D, name)
    if not os.path.exists(p):
        sys.exit(f"missing {p}")
    with open(p) as f:
        for line in f:
            try:
                rec = json.loads(line)
            except ValueError:
                continue
            if "queries" in rec:
                return rec["queries"]["x_jaccard_prefix_full"]
    sys.exit(f"{p}: no ramp record")

def cand(name):
    with open(os.path.join(D, name)) as f:
        m = re.search(r"CANDIDATES=(\d+)", f.read())
        return int(m.group(1)) if m else None

a, b = ramp("jacfix_sf1_8g.json"), ramp("jacfix_sf10_80g.json")
ca, cb = cand("jaccand_sf1.txt"), cand("jaccand_sf10.txt")
fail = a[0] < 0 or b[0] < 0
med = lambda v: abs(v[0])
print(f"sf1 @8g : med {med(a):8.2f}s min {a[1]:8.2f}s jobs {a[2]} scan {a[3]}MB spill {a[4]}MB"
      + ("  [FAILED REP]" if a[0] < 0 else ""))
print(f"sf10@80g: med {med(b):8.2f}s min {b[1]:8.2f}s jobs {b[2]} scan {b[3]}MB spill {b[4]}MB"
      + ("  [FAILED REP]" if b[0] < 0 else ""))
print(f"wall ratio       : {med(b)/med(a):.1f}x med / {b[1]/a[1]:.1f}x min-min")
if ca and cb:
    print(f"candidate ratio  : {cb/ca:.1f}x ({ca:,} -> {cb:,}) [post size-ratio distinct]")
    print(f"wall/workload    : {(med(b)/med(a))/(cb/ca):.2f} (1.0 = wall grows at workload rate)")
print(f"spill ratio      : {b[4]/max(1,a[4]):.1f}x (both >0 = same tier; 0 on sf1 = premise failed)")
pk = os.path.join(D, "jac_peak_scratch.log")
if os.path.exists(pk):
    lines = open(pk).read().splitlines()
    marks = [i for i, l in enumerate(lines) if l.startswith("---- jacfix_sf10")]
    seg = lines[marks[0]:] if marks else lines
    peaks = [int(l.split()[0].split("=")[1]) for l in seg if l.startswith("peak_bytes=")]
    if peaks:
        gb = max(peaks) / 1e9
        print(f"sf10 peak scratch: {gb:.1f} GB -> sf100 projection at the counted "
              f"~{(cb/ca) if ca and cb else 11.8:.0f}x workload: ~{gb*((cb/ca) if ca and cb else 11.8):.0f} GB "
              f"(sandbox free disk ~50 GB)")
