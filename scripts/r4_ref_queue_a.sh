#!/bin/bash
# Round-4 reference queue A: TIGER ref n=2 -> n=4 (VERDICT r3 item 3).
# Adds model seed 43 on both corpora (m42 runs landed in round 3).
# PARITY_REF_OMP=1: queue B runs concurrently on this 2-core host.
set -x
cd /root/repo
SKIP_ALL="ref-sasrec tpu-sasrec ref-tiger tpu-tiger ref-rqvae tpu-rqvae ref-tiger-prefix tpu-tiger-prefix ref-dense-t5 tpu-dense-t5"
skip_except () {
  for s in $SKIP_ALL; do [ "$s" != "$1" ] && printf '%s ' "$s"; done
}

PARITY_REF_OMP=1 nice -n 10 /opt/venv/bin/python scripts/parity_headtohead.py \
  --users 4000 --items 240 --seeds 0 1 --model-seeds 43 --tiger-epochs 30 \
  --no-md --skip $(skip_except ref-tiger) \
  --workdir /tmp/parity_r3 --out artifacts/parity_r4_ref_tiger_m43.json

echo "R4 REF QUEUE A DONE"
