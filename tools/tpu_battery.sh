#!/bin/bash
# Post-tunnel-recovery measurement battery, in priority order. Run it the
# moment the TPU tunnel is back; each step appends to /tmp/battery_r3.log
# so a second wedge mid-run loses nothing. Parity first (any kernel change
# since the last on-device run is unproven until tests_tpu passes), then
# the headline + A/B benches, then the probe scripts (see PERF_NOTES and
# the memory notes for what each measures).
set -x
cd "$(dirname "$0")/.."
LOG=/tmp/battery_r3.log

{
echo "=== battery start $(date) ==="
echo "=== 1. tests_tpu (real-chip parity, ~6 min) ==="
timeout 1500 python -m pytest tests_tpu/ -q 2>&1 | tail -15

echo "=== 2. bench.py headline (exact default) ==="
timeout 900 python bench.py 2>&1 | tail -3

echo "=== 3. bench.py sign-cover A/B ==="
timeout 900 python bench.py --sign-cover 2>&1 | tail -3

echo "=== 4. bench.py all configs ==="
timeout 1800 python bench.py --config all 2>&1 | tail -8

echo "=== 4b. turntable view-batch / fast-sweep A/B ==="
timeout 900 python bench.py --view-batch 2 2>&1 | tail -2
timeout 900 python bench.py --view-batch 4 2>&1 | tail -2
timeout 900 python bench.py --view-batch 4 --fast-sweep 2>&1 | tail -2

echo "=== 5. stage chain (per-stage split) ==="
timeout 600 python tools/probes/stage_chain3.py 2>&1 | tail -25

echo "=== 6. VPU calibration (roofline) ==="
timeout 600 python tools/probes/vpu_cal.py 2>&1 | tail -15

echo "=== 7. sweep decomposition (turntable per-view gap) ==="
timeout 900 python tools/probes/sweep_decomp.py 2>&1 | tail -25

echo "=== 8. dispatch overlap (the ~0.55 ms bench-vs-chained gap) ==="
timeout 900 python tools/probes/dispatch_overlap.py 2>&1 | tail -6

echo "=== battery done $(date) ==="
} 2>&1 | tee -a "$LOG"
