#!/bin/bash
# On-chip measurement battery, in priority order. Run after any tunnel
# recovery or before closing a round; each step appends to
# /tmp/battery_r4.log so a wedge mid-run loses nothing. Parity first (any
# kernel change since the last on-device run is unproven until tests_tpu
# passes), then the headline + config benches, then the probes (see
# PERF_NOTES for what each measures). Never run two TPU processes at once.
set -x
cd "$(dirname "$0")/.."
LOG=/tmp/battery_r4.log

{
echo "=== battery start $(date) ==="
echo "=== 1. tests_tpu (real-chip parity, ~12 min) ==="
timeout 1800 python -m pytest tests_tpu/ -q 2>&1 | tail -5

echo "=== 2. bench.py headline (exact default) ==="
timeout 900 python bench.py 2>&1 | tail -1

echo "=== 3. bench.py all configs ==="
timeout 3000 python bench.py --config all 2>&1 | tail -8

echo "=== 4. turntable view-batch A/B ==="
timeout 1500 python bench.py --view-batch 4 2>&1 | tail -1

echo "=== 5. in-situ kernel slope (chunk-body / epilogue / fixed) ==="
timeout 1500 python tools/probes/raster_slope.py --check 2>&1 | tail -10

echo "=== 6. cumulative per-stage chain (the honest decomposition) ==="
timeout 1700 python tools/probes/cum_chain.py 2>&1 | tail -7

echo "=== 7. fixed-frame floor ==="
timeout 1500 python tools/probes/floor.py 2>&1 | tail -9

echo "=== 8. dispatch overlap (tunnel residue) ==="
timeout 900 python tools/probes/dispatch_overlap.py 2>&1 | tail -4
echo "=== battery done $(date) ==="
} 2>&1 | tee -a "$LOG"
