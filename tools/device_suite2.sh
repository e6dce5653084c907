#!/bin/bash
# Follow-up device suite: re-runs the tools that failed in the first
# round-4 window (sys.path: `python tools/x.py` lacked the repo root;
# microbench additionally needed chunked scalar-prefetch for U=1M).
# Run AFTER tools/device_suite.sh's bench sequence so nothing overlaps.
set -u
OUT=/tmp/devsuite
mkdir -p "$OUT"
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_bench_cache
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"

run() {
  local name=$1 to=$2; shift 2
  echo "=== $name ($(date +%T)) ==="
  timeout "$to" "$@" 2>&1 | tee "$OUT/$name.log" | tail -25
  echo "--- $name exit=$? ---"
}

run microbench 900 python tools/microbench.py
run cliff_repro5 900 python tools/cliff_repro5.py
run cliff_repro6 900 python tools/cliff_repro6.py
run ms_ab2 2400 python tools/ms_ab2.py
echo "=== suite2 done ==="
