#!/bin/bash
# One serialized chip session: each leg is gated on tunnel health (a
# FRESH-shape tiny compile — the remote_compile service has bad phases
# where compiles wedge at 0% host CPU; CLAUDE.md) and retried on timeout.
# Never runs two chip jobs at once. Usage: tools/chip_session.sh <logdir>
set -u
LOG=${1:-/tmp/chip}
mkdir -p "$LOG"
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=/tmp/zuds-tpu-jax-cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=5

fresh_probe() {
  # distinct odd shape per call -> a genuinely fresh compile each time
  local n=$((311 + (RANDOM % 400) * 2))
  timeout 60 python -c "
import time, jax, jax.numpy as jnp
t0=time.time()
f = jax.jit(lambda a: jnp.sin(a @ a).sum())
y = f(jnp.ones(($n, $n))); y.block_until_ready()
print('probe n=$n ok %.1fs' % (time.time()-t0), flush=True)
" >> "$LOG/probe.log" 2>&1
}

wait_healthy() {
  for i in $(seq 1 40); do
    echo "probe attempt $i $(date +%T)" >> "$LOG/probe.log"
    if fresh_probe; then return 0; fi
    sleep 120
  done
  return 1
}

run_leg() {  # name, timeout_s, cmd...
  local name=$1 tmo=$2; shift 2
  for try in 1 2 3; do
    wait_healthy || { echo "$name: tunnel never healthy" >> "$LOG/$name.log"; return 1; }
    echo "=== $name try $try $(date +%T) ===" >> "$LOG/$name.log"
    timeout "$tmo" "$@" >> "$LOG/$name.log" 2>&1
    local rc=$?
    echo "$name try $try exit=$rc $(date +%T)" >> "$LOG/$name.log"
    [ $rc -eq 0 ] && return 0
    sleep 60
  done
  return 1
}

run_leg synth 1200 python -u bench.py
run_leg link 600 python -u tools/bench_link.py 38 4
run_leg files 1500 env BENCH_FILES_OUT=BENCH_files_r04.json \
    ZUDS_NIGHT_TIMING=1 python -u bench.py --files
run_leg warpbf16 1200 python -u tools/bench_warp_bf16.py 2 40
run_leg bisect 2400 python -u tools/bisect_pipeline.py
echo "ALL DONE $(date +%T)"
