#!/usr/bin/env python3
"""Re-pin bench_reference.json entries from a full-bench artifact (dev-only).

Usage: python3 tools/repin_reference.py BENCH_rN_full.json CONTROL.json qA,qB,...

Protocol (the round-9/round-10 precedent, see bench_reference.json's
comment): entries live on the round-8 reference host's normalized scale.
A query measured on THIS VM is mapped onto that scale by dividing its
median-of-3 normalized time by the shared-set host factor — the ratio of
this VM's normalized shared-set sum (byte-identical old code, the
committed BENCH_r*code_on_r*vm control) to the reference entries' sum —
because cal_spin normalization alone cannot see memory/parallel-throughput
wobble between VMs.

Only the named queries are (re)pinned; everything else is untouched.
"""
import json
import sys

bench_path, control_path, names = sys.argv[1], sys.argv[2], sys.argv[3].split(",")
bench = json.load(open(bench_path))
control = json.load(open(control_path))
ref = json.load(open("bench_reference.json"))

qn = control["queries_normalized"]
shared = [k for k in qn if k in ref["queries"]]
factor = sum(qn[k] for k in shared) / sum(ref["queries"][k] for k in shared)
print(f"shared-set host factor: {factor:.4f} over {len(shared)} queries")

for name in names:
    t = bench["queries_normalized"][name]
    old = ref["queries"].get(name)
    ref["queries"][name] = round(t / factor, 3)
    print(f"{name}: {old} -> {ref['queries'][name]} (thisVM norm {t})")

json.dump(ref, open("bench_reference.json", "w"), indent=1)
print("bench_reference.json updated — append the rationale to its comment by hand")
