#!/bin/bash
# Segment runner for the at-scale proof (tools/tpu_train_scale.py seg).
# The remote TPU tunnel hangs every ~35-45 min of continuous use, so each
# 4500-step segment runs as a fresh process under `timeout`; a hang costs
# one segment (resume from ckpt_last). Exit 42 from the stage = 30k done.
set -u
cd /root/repo
MAX_SEGS=${MAX_SEGS:-8}
STAGE=${STAGE:-seg}
RUN_EVAL=${RUN_EVAL:-1}
for i in $(seq 1 "$MAX_SEGS"); do
  echo "=== segment attempt $i $(date -u +%H:%M:%S) ==="
  timeout "${SEG_TIMEOUT:-1800}" python tools/tpu_train_scale.py "$STAGE"
  rc=$?
  if [ "$rc" -eq 42 ]; then
    if [ "$RUN_EVAL" = "1" ]; then
      echo "=== all segments done; running final eval ==="
      timeout 1800 python tools/tpu_train_scale.py eval
      echo "=== EVAL_RC=$? ==="
    fi
    exit 0
  fi
  echo "=== segment rc=$rc; retrying ==="
  sleep 10
done
echo "=== gave up after $MAX_SEGS attempts ==="
exit 1
