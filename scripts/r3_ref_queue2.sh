#!/bin/bash
# Round-3 reference-side queue, take 2. The 15-epoch DenseT5 protocol costs
# ~20 min/epoch on this 2-core host (~5h/run) — undeliverable in-session, so
# the DenseT5 head-to-head is compared at 10 epochs BOTH sides (the tpu side
# is re-run at 10 epochs to match; with best-val checkpointing and patience
# 10 the comparison stays budget-fair). SASRec extras run in a parallel
# process (scripts/../tmp r3_sasrec_queue). Artifacts land incrementally.
set -x
cd /root/repo
SKIP_ALL="ref-sasrec tpu-sasrec ref-tiger tpu-tiger ref-rqvae tpu-rqvae ref-tiger-prefix tpu-tiger-prefix ref-dense-t5 tpu-dense-t5"

skip_except () {
  for s in $SKIP_ALL; do [ "$s" != "$1" ] && printf '%s ' "$s"; done
}

# 1. DenseT5 reference: corpus 0 then corpus 1, m42, 10 epochs
nice -n 10 /opt/venv/bin/python scripts/parity_headtohead.py --users 4000 --items 240 \
  --seeds 0 --model-seeds 42 --dense-t5-epochs 10 --no-md \
  --skip $(skip_except ref-dense-t5) \
  --workdir /tmp/parity_r3 --out artifacts/parity_r3_ref_dense_s0.json
nice -n 10 /opt/venv/bin/python scripts/parity_headtohead.py --users 4000 --items 240 \
  --seeds 1 --model-seeds 42 --dense-t5-epochs 10 --no-md \
  --skip $(skip_except ref-dense-t5) \
  --workdir /tmp/parity_r3 --out artifacts/parity_r3_ref_dense_s1.json

# 2. TIGER-prefix reference: corpus 1, m42 (~2h)
nice -n 10 /opt/venv/bin/python scripts/parity_headtohead.py --users 4000 --items 240 \
  --seeds 1 --model-seeds 42 --prefix-epochs 25 --no-md \
  --skip $(skip_except ref-tiger-prefix) \
  --workdir /tmp/parity_r3 --out artifacts/parity_r3_ref_prefix_s1.json

echo "R3 REF QUEUE2 DONE"
