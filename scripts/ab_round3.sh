#!/usr/bin/env bash
# Round-3 pending on-chip A/B matrix, run sequentially (ONE TPU process at a
# time — concurrent jobs through the tunnel serialize and time out).
#
# Captures, in order of expected value:
#   1. baseline window bench (reproduces the ~354 ms / 11.05 ms/frame state)
#   2. VDA_PAD_GRANULE=16   (encoder-wide 2.3% fewer matmul rows, ~3.5 ms hope)
#   3. VDA_STREAM_DIRECT=1  (fused ring-buffer KV kernel, ~3 ms/step hope)
#
# Each line of /tmp/ab_r3.jsonl is {"tag": ..., ...bench json}.
# Usage: bash scripts/ab_round3.sh [out.jsonl]
set -u
cd "$(dirname "$0")/.."
OUT="${1:-/tmp/ab_r3.jsonl}"
: > "$OUT"

run() {
  local tag="$1"; shift
  echo "=== $tag ($(date +%H:%M:%S)) ===" >&2
  # 25 min cap: vitl compiles take 1-4 min each through the remote compile
  # server; a hang past that means the tunnel is wedged — move on.
  local line
  line=$(timeout 1500 env "$@" python bench.py 2>/tmp/ab_r3_err.log | grep "^{" | tail -1)
  if [ -n "$line" ]; then
    echo "{\"tag\": \"$tag\", ${line#\{}" >> "$OUT"
    echo "$line" >&2
  else
    echo "{\"tag\": \"$tag\", \"error\": \"no output (timeout or crash)\"}" >> "$OUT"
    tail -5 /tmp/ab_r3_err.log >&2
  fi
}

# 1. baseline: full default bench (window + wb sweep + pallas gate + streaming)
run baseline VDA_BENCH_REPS=5

# 2. pad granule 16 — window path only (streaming/wb off to save tunnel time)
run granule16 VDA_PAD_GRANULE=16 VDA_BENCH_STREAM=0 VDA_BENCH_WB=0 VDA_BENCH_CHECK=0

# 3. direct-buffer streaming kernel — compile-probe the kernel structure at
#    tiny shapes FIRST (a pathological Mosaic compile hangs the remote
#    compiler and wedges the tunnel; probe stages are alarm-bounded)
echo "=== stream-kernel probe ($(date +%H:%M:%S)) ===" >&2
if timeout 1500 python scripts/probe_stream_kernel.py trivial full full1024 big \
     > /tmp/ab_r3_probe.log 2>&1 && ! grep -q HANG /tmp/ab_r3_probe.log; then
  cat /tmp/ab_r3_probe.log >&2
  run stream_direct VDA_STREAM_DIRECT=1 VDA_BENCH_WB=0 VDA_BENCH_CHECK=0 \
      VDA_BENCH_REPS=3 VDA_BENCH_CHAIN=1
else
  cat /tmp/ab_r3_probe.log >&2
  echo '{"tag": "stream_direct", "error": "kernel probe failed/hung — skipped"}' >> "$OUT"
fi

echo "=== done ===" >&2
cat "$OUT"
