#!/bin/sh
# Round-2 on-chip A/B queue: bit-parity checks first, then bench A/Bs
# of the fused-stats and merged-frontend paths and batch-size sweeps.
# Run from /root/repo with the axon TPU env active; logs to stdout.
# Each step is individually time-bounded; a wedged tunnel fails fast.
set -x
cd /root/repo

# The watcher only launches this once jax.devices() already succeeded;
# skip bench.py's own per-run backend probe (each one is a full
# tunnel init that would eat into the 600s-per-step budget).
METERELF_BENCH_NO_PROBE=1
export METERELF_BENCH_NO_PROBE

echo "=== 1. quad kernels bit-parity (incl. fused chain + merged) ==="
timeout 1200 python experiments/quad_kernels_check.py \
    || { echo "PARITY CHECK FAILED — not benching a bit-broken path"; \
         exit 1; }

echo "=== 2. bench baseline (hist_pallas, split) ==="
timeout 600 python bench.py

echo "=== 3. bench fused stats ==="
timeout 600 env METERELF_QUAD_STATS=fused python bench.py

echo "=== 4. bench merged frontend ==="
timeout 600 env METERELF_FRONTEND=merged python bench.py

echo "=== 5. bench fused + merged ==="
timeout 600 env METERELF_QUAD_STATS=fused METERELF_FRONTEND=merged \
    python bench.py

echo "=== 6. batch sweep on fused+merged ==="
timeout 600 env METERELF_QUAD_STATS=fused METERELF_FRONTEND=merged \
    METERELF_BENCH_BATCH=384 python bench.py
timeout 600 env METERELF_QUAD_STATS=fused METERELF_FRONTEND=merged \
    METERELF_BENCH_BATCH=512 python bench.py

echo "=== 7. CCL/stats group-size sweep (floor-dominated in the old"
echo "    bench; re-test with the amortized one) ==="
timeout 600 env METERELF_CCL_GQ=4 python bench.py
timeout 600 env METERELF_CCL_GQ=16 python bench.py
timeout 600 env METERELF_STATS_GW=4 python bench.py
timeout 600 env METERELF_STATS_GW=16 python bench.py

echo "=== done ==="
