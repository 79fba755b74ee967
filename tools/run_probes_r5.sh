#!/bin/bash
# Round-5 measurement queue (VERDICT r4 tasks 2, 3, 5): runs every stale
# probe + the long-KV scaling + the speculation end-to-end benchmark,
# strictly sequentially (chip jobs must run alone — memory gotcha #6),
# logging to PROBE_r05.log / SCALING_r05.log / SERVING_r05.log.
# Usage: bash tools/run_probes_r5.sh   (from /root/repo, chip idle)
set -u
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo

{
  echo "== probe_ring_trace (batch ring + fused ring W=1, post-r4 double-buffering) =="
  timeout 2400 python -u tools/probe_ring_trace.py 2>&1 | grep -v -i warning
  echo
  echo "== probe_varlen_ring_trace (fixed packed_self=True baseline, advisor r3) =="
  timeout 2400 python -u tools/probe_varlen_ring_trace.py 2>&1 | grep -v -i warning
} > PROBE_r05.log 2>&1

{
  echo "== exp_scaling --long (8k..131k causal fwd / fwd+bwd) =="
  timeout 9000 python -u tools/exp_scaling.py --long --xl 2>&1 | grep -v -i warning
  echo
  echo "== exp_bwd_split_r4 at S=65536 (split-kernel block sweep, long-KV regime) =="
  timeout 5400 python -u tools/exp_bwd_split_r4.py 65536 2>&1 | grep -v -i warning
} > SCALING_r05.log 2>&1

{
  echo "== benchmark_serving (decode + spec verify + prefill + speculation e2e) =="
  timeout 3600 python -u -m benchmark.benchmark_serving 2>&1 | grep -v -i warning
} > SERVING_r05.log 2>&1

echo "all probes done"
