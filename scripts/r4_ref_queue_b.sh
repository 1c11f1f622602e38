#!/bin/bash
# Round-4 reference queue B: TIGER-prefix ref n=1 -> n=2 (corpus 1), then an
# optional DenseT5 ref extra seed (corpus 0, m43, 10-epoch budget — the r3
# logs show ref best-val epoch is ~4-5, so 10 epochs is converged for ref).
# Artifacts land incrementally; the dense tail is best-effort.
set -x
cd /root/repo
SKIP_ALL="ref-sasrec tpu-sasrec ref-tiger tpu-tiger ref-rqvae tpu-rqvae ref-tiger-prefix tpu-tiger-prefix ref-dense-t5 tpu-dense-t5"
skip_except () {
  for s in $SKIP_ALL; do [ "$s" != "$1" ] && printf '%s ' "$s"; done
}

PARITY_REF_OMP=1 nice -n 10 /opt/venv/bin/python scripts/parity_headtohead.py \
  --users 4000 --items 240 --seeds 1 --model-seeds 42 --prefix-epochs 25 \
  --no-md --skip $(skip_except ref-tiger-prefix) \
  --workdir /tmp/parity_r3 --out artifacts/parity_r4_ref_prefix_s1.json

PARITY_REF_OMP=1 nice -n 10 /opt/venv/bin/python scripts/parity_headtohead.py \
  --users 4000 --items 240 --seeds 0 --model-seeds 43 --dense-t5-epochs 10 \
  --no-md --skip $(skip_except ref-dense-t5) \
  --workdir /tmp/parity_r3 --out artifacts/parity_r4_ref_dense_s0m43.json

echo "R4 REF QUEUE B DONE"
