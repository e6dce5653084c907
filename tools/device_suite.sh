#!/bin/bash
# Device measurement suite — run the moment the TPU tunnel is up.
# One tunnel window harvests every open measurement (the tunnel has been
# flaky for hours at a time, so everything is sequenced into one script
# with per-step timeouts and all output persisted under /tmp/devsuite/).
#
#   bash tools/device_suite.sh            # full suite (~30 min)
#   bash tools/device_suite.sh quick      # probes + ms_ab2 only
#
# Order is priority order — if the tunnel dies mid-run, the most
# decision-relevant numbers land first:
#   1. h2d_probe      — wire bandwidth / parallel-stream scaling (r5 #3)
#   2. ms_ab2         — {f32,bf16} x {pallas,xla} multislot A/B; the
#                       bf16-pallas cell retests the MosaicError (r5 #4)
#   3. bench multislot (f32 + bf16 + async)  — driver-protocol numbers
#   4. bench deepfm   — flagship + prod variant (metrics ON + mid-run ckpt)
#   5. serving_bench  — on-chip serving numbers (r5 #7)
#   6. quality tail   — north-star AUC + reference parity on the chip
set -u
OUT=/tmp/devsuite
mkdir -p "$OUT"
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_bench_cache
# `python tools/x.py` puts tools/ (not the repo root) on sys.path
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 to=$2; shift 2
  echo "=== $name ($(date +%T)) ==="
  timeout "$to" "$@" 2>&1 | tee "$OUT/$name.log" | tail -20
  echo "--- $name exit=$? ---"
}

# Probe the TPU. With MT_SUITE_WAIT=1, loop until the tunnel comes up
# (healthy windows are short and intermittent — launch the suite in wait
# mode and it starts the moment a window opens, with no gap and no second
# claimant: concurrent claims through the tunnel hang each other).
probe() {
  timeout 180 python -c "import jax; assert jax.devices()[0].platform in ('tpu','axon'), jax.devices()" 2>/dev/null
}
echo "probing TPU..."
if ! probe; then
  if [ "${MT_SUITE_WAIT:-0}" = "1" ]; then
    until probe; do echo "TPU down at $(date +%T); retrying..."; sleep 45; done
  else
    echo "TPU unreachable; aborting"; exit 1
  fi
fi
echo "TPU OK at $(date +%T)"

# preflight: one tiny real train step end-to-end on the chip (~1 min incl.
# compile) so a flaky window fails fast here, not 10 min into a bench
run preflight 240 python - <<'EOF'
import jax
from monolith_tpu.data.synthetic import SyntheticCTR
from monolith_tpu.embedding.engine import EngineConfig
from monolith_tpu.models.deepfm import DeepFMTask
from monolith_tpu.training.trainer import Trainer, TrainerConfig
t = Trainer(DeepFMTask(embedding_dim=8, capacity_per_shard=4096,
                       hidden=(16, 8)),
            TrainerConfig(engine=EngineConfig(num_shards=1, unique_cap=512,
                                              new_cap=512), log_every=0))
d = SyntheticCTR(num_users=100, num_items=60, batch_size=256, seed=0)
out = t.train_step(*d.batch())
jax.block_until_ready(out["loss"])
print("preflight OK on", jax.devices()[0].platform, float(out["loss"]))
EOF

run h2d_probe 900 python tools/h2d_probe.py
run microbench 900 python tools/microbench.py
run cliff_probe 1200 python tools/cliff_probe.py all
run ms_ab2 1800 python tools/ms_ab2.py

if [ "${1:-full}" = "quick" ]; then exit 0; fi

run bench_multislot_f32 900 env MT_BENCH_CONFIG=multislot python bench.py
run bench_multislot_bf16 900 env MT_BENCH_CONFIG=multislot MT_BENCH_DTYPE=bf16 python bench.py
# 1-step-stale pipelined block: overlaps the serial write-back scatter
# (the ~8.4 ms XLA bottleneck at U=49k) with the next step's compute
run bench_multislot_f32_async 900 env MT_BENCH_CONFIG=multislot MT_BENCH_ASYNC=1 python bench.py
run bench_multislot_bf16_async 900 env MT_BENCH_CONFIG=multislot MT_BENCH_DTYPE=bf16 MT_BENCH_ASYNC=1 python bench.py
run bench_deepfm 900 env MT_BENCH_CONFIG=deepfm python bench.py
run bench_deepfm_prod 1200 env MT_BENCH_CONFIG=deepfm MT_BENCH_PROD=1 python bench.py
# on-chip serving (VERDICT r4 #7): in-process + gRPC predict against an
# exported model; includes one hot-swap latency measurement
run serving_bench 1200 python tools/serving_bench.py
# quality tail (round-4): north-star AUC on the chip + the reference
# demo-model head-to-head (its TF twin runs on host CPU regardless)
run bench_auc 1800 env MT_BENCH_CONFIG=auc python bench.py
run bench_auc_parity 1200 env MT_BENCH_CONFIG=auc_parity python bench.py
echo "=== suite done; logs in $OUT ==="
