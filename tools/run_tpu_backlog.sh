#!/bin/bash
# TPU measurement backlog — run when the axon relay returns after an
# outage. Ordered cheapest-compile-first so partial progress still
# yields numbers; every step logs to tools/tpu_logs/ and failures don't
# stop later steps. Results to fold into BASELINE.md / STATUS.md:
#   bench.json aux: bilateral_ms(+_lax), raycast_deep_ms,
#     integrate_color_ms, integrate_pose_bwd_ms, kinfu_tracked_ms_256,
#     scenefusion_ms_255
#   config runners: tools/run_config{1,2,3,4,4b,5}.py
# Never kill these by pattern; use the PIDs echoed below.

set -u
cd "$(dirname "$0")/.."
mkdir -p tools/tpu_logs

probe() {
  python - <<'EOF'
import socket, sys
for p in (8083, 8082):
    try:
        s = socket.socket(); s.settimeout(4)
        s.connect(("127.0.0.1", p)); s.close()
        sys.exit(0)
    except OSError:
        pass
sys.exit(1)
EOF
}

if ! probe; then
  echo "relay still down (8082/8083 refused); aborting" >&2
  exit 1
fi

run() {
  name=$1; tmo=$2; shift 2
  echo "=== $name (timeout ${tmo}s) ==="
  timeout "$tmo" "$@" > "tools/tpu_logs/$name.log" 2>&1
  echo "    exit $? — tools/tpu_logs/$name.log"
}

# 1. trivial compile probe (detects a jammed compile queue early)
run probe_jit 120 python -c "
import jax, jax.numpy as jnp
print(float(jax.jit(lambda a: a + 1)(jnp.ones(8)).sum()))"

# 2. on-device smoke suite (kernel == lax compiled)
run tests_tpu 1800 python -m pytest tests_tpu -q

# 3. the bench of record
run bench 1800 python bench.py

# 4. config runners (BASELINE.md table rows)
run config1 900 python tools/run_config1.py
run config2 900 python tools/run_config2.py
run config3 1800 python tools/run_config3.py
run config4 1200 python tools/run_config4.py
run config4b 1200 python tools/run_config4b.py
run config5 1200 python tools/run_config5.py

# 5. driver entry (single-chip compile check + CPU-mesh dryrun)
run graft_entry 900 python __graft_entry__.py

echo "backlog complete; fold numbers into BASELINE.md and re-check"
echo "BENCH_BASELINE vs bench.json headline"
