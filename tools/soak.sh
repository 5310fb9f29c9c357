#!/usr/bin/env bash
# Tri-scale oracle soak + determinism sweep (dev-only; run before round end).
#
#   tools/soak.sh            # full sweep: sf0.001/0.01/0.1 oracles + CPUS=3v8 diff
#   QUERIES=q78_range_frame,q69_null_safe_eq tools/soak.sh   # targeted
#   tools/soak.sh selftest   # prove the harness detects a seeded boundary flip
#
# Rationale: the driver's gate runs only at sf0.01/CPUS=4. Two bug classes
# only show elsewhere: float-parity boundary flips are data-dependent
# (different rows land on a .5 / frame boundary at each sf), and
# partition-order-dependent double sums flip a rounded digit between
# core counts. Every round-3 float bug was found by exactly this sweep.
set -u
cd "$(dirname "$0")/.."
QUERIES="${QUERIES:-}"
OUT="${OUT:-/tmp/graft_soak}"
fail=0

verify() { # sfdir outdir cpus
  mkdir -p "$(dirname "$2")"
  if [ -n "$QUERIES" ]; then
    SPARK_GRAFT_CPUS="$3" sbt -batch "runMain graft.Verify $1 $2 $QUERIES" >"$2.log" 2>&1
  else
    SPARK_GRAFT_CPUS="$3" sbt -batch "runMain graft.Verify $1 $2" >"$2.log" 2>&1
  fi || { echo "VERIFY RUN FAILED: $1 (log: $2.log)"; fail=1; }
}

if [ "${1:-}" = "selftest" ]; then
  # Seed one divergence per red-row class and require check_oracle to catch
  # BOTH — proving the harness would see a driver-style divergence if it
  # were data-dependent:
  #  - q78: shrink the oracle's RANGE bound by one cent (rows whose nearest
  #    peer sits exactly on the old bound drop out of the frame);
  #  - q82: shrink the quantizer's +0.5 to +0.4999 — measured to flip
  #    exactly ONE vector's sum_q at sf0.01, i.e. the harness must detect a
  #    single diverging integer out of 500 rows (the q82 driver-red shape).
  QUERIES=q78_range_frame,q82_emb_quantize
  verify /root/testdata/sf0.01 "$OUT/selftest" 8
  python3 - "$OUT/selftest" <<'EOF'
import json, sys
p = f"{sys.argv[1]}/oracle_sql.json"
sqls = json.load(open(p))
sqls["q78_range_frame"] = sqls["q78_range_frame"].replace(
    "RANGE BETWEEN 100000 PRECEDING AND 100000 FOLLOWING",
    "RANGE BETWEEN 99999 PRECEDING AND 99999 FOLLOWING")
sqls["q82_emb_quantize"] = sqls["q82_emb_quantize"].replace(
    "x * scale + 0.5", "x * scale + 0.4999")
assert "0.4999" in sqls["q82_emb_quantize"], "q82 perturbation did not apply"
json.dump(sqls, open(p, "w"))
EOF
  python3 tools/check_oracle.py /root/testdata/sf0.01 "$OUT/selftest" >"$OUT/selftest.res" 2>&1
  ok=1
  grep -q "FAIL q78_range_frame" "$OUT/selftest.res" || { echo "SELFTEST FAILED: frame-bound flip not detected"; ok=0; }
  grep -q "FAIL q82_emb_quantize" "$OUT/selftest.res" || { echo "SELFTEST FAILED: quantizer flip not detected"; ok=0; }
  grep -q "PASS " "$OUT/selftest.res" && { echo "SELFTEST FAILED: a perturbed query still passed"; ok=0; }
  if [ $ok -eq 1 ]; then
    echo "SELFTEST OK: both seeded divergences detected:"
    grep FAIL "$OUT/selftest.res" | head -4
    exit 0
  fi
  exit 1
fi

for sf in 0.001 0.01 0.1; do
  d="$OUT/sf$sf"
  verify "/root/testdata/sf$sf" "$d" 8
  if python3 tools/check_oracle.py "/root/testdata/sf$sf" "$d" >"$d.res" 2>&1; then
    echo "PASS oracle sweep sf$sf: $(tail -1 "$d.res")"
  else
    echo "FAIL oracle sweep sf$sf:"; grep FAIL "$d.res" | head -5; fail=1
  fi
done

# ANN recall floors at sf0.1 (r8 verdict #8): the rows-only approx family
# must clear the same floors it clears at test scale — a scale-dependent
# recall cliff (bucket-bit adaptivity, probe counts) cannot hide
if SPARK_GRAFT_CPUS=8 sbt -batch "runMain graft.tools.RecallProbe /root/testdata/sf0.1" >"$OUT/recall.log" 2>&1; then
  grep "RECALL" "$OUT/recall.log"
else
  echo "FAIL ANN recall floors at sf0.1:"; grep "RECALL" "$OUT/recall.log"; fail=1
fi

# determinism: CPUS=3 vs the CPUS=8 sf0.01 run above must be row-identical
verify /root/testdata/sf0.01 "$OUT/cpu3" 3
python3 - "$OUT/sf0.01" "$OUT/cpu3" <<'EOF' || fail=1
import sys, glob, os
sys.path.insert(0, "tools")
from check_oracle import load_spark, normalize
a_dir, b_dir = sys.argv[1], sys.argv[2]
names = sorted(os.path.basename(p) for p in glob.glob(f"{b_dir}/*") if os.path.isdir(p))
bad = 0
for n in names:
    a, b = load_spark(a_dir, n), load_spark(b_dir, n)
    if a is None or b is None:
        print(f"FAIL determinism {n}: missing output"); bad += 1; continue
    a, b = normalize(a), normalize(b)
    if a.shape != b.shape:
        print(f"FAIL determinism {n}: shape {a.shape} vs {b.shape}"); bad += 1; continue
    diffs = [c for c in a.columns
             if not ((a[c] == b[c]) | (a[c].isna() & b[c].isna())).all()]
    if diffs:
        print(f"FAIL determinism {n}: diff cols {diffs}"); bad += 1
print(f"determinism: {len(names) - bad}/{len(names)} queries identical at CPUS=3 vs 8")
sys.exit(1 if bad else 0)
EOF

[ $fail -eq 0 ] && echo "SOAK GREEN" || echo "SOAK FAILED"
exit $fail
