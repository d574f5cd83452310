#!/bin/bash
# Round-5 science session, part 2 (VERDICT r4 item 3): generate the
# COMMITTED quantitative artifacts for the drift-forensics and
# drift-optimization experiment families (the machinery + CI smokes
# landed earlier; this produces the numbers the artifact pins in
# tests/test_examples.py assert), then run the full suite so the pins
# activate. Serial on the single CPU core; waits for the r5 sweep
# session to release it first. Per-step commits so a dead driving
# session loses nothing (the round-4 lesson).
#
# Reference analogs: README.md:100-118 (forensics recipe),
# README.md:120-139 (optimization), train.py:241-273 (adv search).
set -u
cd "$(dirname "$0")/.."
LOG=results/science_session_r5.log
CPU_ENV=(env -u PALLAS_AXON_POOL_IPS -u PALLAS_AXON_REMOTE_COMPILE
         -u PYTHONPATH JAX_PLATFORMS=cpu
         JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache_tests)

# wait (up to 4 h) for the sweep session to release the CPU core
if [ -f /tmp/sweep_r5.pid ]; then
  pid=$(cat /tmp/sweep_r5.pid)
  for _ in $(seq 1 480); do
    kill -0 "$pid" 2>/dev/null || break
    sleep 30
  done
fi

run() {
  local budget="$1"; shift
  echo "=== $(date +%H:%M:%S) $*" | tee -a "$LOG"
  timeout "$budget" "$@" 2>&1 | tee -a "$LOG"
  echo "=== rc=$? $(date +%H:%M:%S)" | tee -a "$LOG"
}

commit() {
  local msg="$1"; shift
  local have=()
  for p in "$@"; do [ -e "$p" ] && have+=("$p"); done
  if [ "${#have[@]}" -gt 0 ]; then
    git add -A "${have[@]}" "$LOG" 2>/dev/null
    git commit -q -m "$msg" && echo "committed: $msg" | tee -a "$LOG"
  fi
}

run 5400 "${CPU_ENV[@]}" python examples/drift_forensics.py \
  --targets all gamma_correct --pre_epochs 12 --adv_epochs 8
commit "Drift-forensics artifacts: adversarial ISP accuracy collapse under the SSIM bound" \
  results/forensics_all.json results/forensics_gamma_correct.json

run 3600 "${CPU_ENV[@]}" python examples/drift_optimization.py --epochs 12
commit "Drift-optimization artifact: joint vs frozen-ISP learning curves" \
  results/drift_optimization.json

run 2400 ./run_tests.sh
commit "science session r5: full-suite log (artifact pins active)" results

echo "=== science session r5 done $(date)" | tee -a "$LOG"
