#!/bin/bash
# Serialized TPU experiment queue (PERF.md "Next levers" — run when the
# axon tunnel is up).  One TPU process at a time; logs land in
# /tmp/expq/.  Order matters: kernel validation A/Bs first, then the
# headline sweep, then bench.py for the record.
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=/tmp/expq
mkdir -p "$LOG"
for s in extractor_ab train_step_ab ffn_ab ffn_fused_ab attn_epilogue_ab \
         ffn_dropout_ab bwd_roofline ffn_bwd_ab beam_serving \
         large_pair_train headline; do
  echo "=== $s $(date -u +%H:%M:%S) ==="
  timeout 3000 python /root/repo/experiments/$s.py >"$LOG/$s.log" 2>&1
  echo "--- exit $? ; tail:"
  tail -n 25 "$LOG/$s.log"
done
echo "=== bench.py $(date -u +%H:%M:%S) ==="
timeout 3000 python /root/repo/bench.py >"$LOG/bench.log" 2>&1
echo "--- exit $? ; tail:"
tail -n 5 "$LOG/bench.log"
