#!/bin/bash
# Keep-alive experiment (r18): re-run the bench sweep while 32 nice-19
# busy spinners keep every vCPU from parking, so hypervisor-side
# scheduler-wakeup latency (the idle host reads p99 2,300-10,000 us;
# kept-alive it reads ~130-190 us) is removed as a variable at the
# cost of measurable CPU contention. Run as root. Results land in
# bench.json as usual -- archive to bench_records/ yourself; the
# record self-describes the intervention via load_start/load_end ~30
# and calib_32t elevated vs the ~0.52 clean-host yardstick.
#
# Findings on record (bench_records/README.md, runs 6-7): totals are
# INVARIANT at 322.7-325.2 s across slow-wake+full-CPU,
# fast-wake+half-CPU, and fast-wake+~70%-CPU -- the host charges a
# uniform factor through one currency or the other. Per-query, the
# mechanism flips exactly as the wake-tax model predicts: stage-heavy
# queries speed up under keep-alive (q104 7.44->3.37 s, q105
# 6.01->3.20, q156 3.38->2.10 vs the slow-wake run 5) while CPU-heavy
# ones slow down (q141 6.08->7.77, q99 3.76->4.38).
set -e
cd "$(dirname "$0")/.."

AUTOGROUP=$(cat /proc/sys/kernel/sched_autogroup_enabled 2>/dev/null || echo "")
[ -n "$AUTOGROUP" ] && echo 0 > /proc/sys/kernel/sched_autogroup_enabled

cat > /tmp/graft_spin.py <<'EOF'
x = 1
while True:
    x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 64)
EOF
PIDS=()
for i in $(seq 1 "$(nproc)"); do
  nice -n 19 python3 /tmp/graft_spin.py & PIDS+=($!)
done
cleanup() {
  kill "${PIDS[@]}" 2>/dev/null || true
  [ -n "$AUTOGROUP" ] && echo "$AUTOGROUP" > /proc/sys/kernel/sched_autogroup_enabled
}
trap cleanup EXIT

sleep 3
SPARK_GRAFT_SF_DIR="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}" \
SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}" \
  sbt -batch 'runMain graft.Bench'
