#!/bin/bash
# Round-3 reference-side parity queue (sequential, low priority, 2-core host).
# Fills the gaps VERDICT.md #1/#8 names: DenseT5 (zero ref runs), SASRec
# (4 missing grid cells to reach the 2-corpus x 4-model-seed tpu grid),
# TIGER-prefix (n=1 -> more seeds). Each stage writes its own artifact;
# PARITY.md is regenerated at the end of the round by scripts/parity_merge.py.
set -x
cd /root/repo
SKIP_ALL="ref-sasrec tpu-sasrec ref-tiger tpu-tiger ref-rqvae tpu-rqvae ref-tiger-prefix tpu-tiger-prefix ref-dense-t5 tpu-dense-t5"

skip_except () {  # echo SKIP_ALL minus $1
  for s in $SKIP_ALL; do [ "$s" != "$1" ] && printf '%s ' "$s"; done
}

# 1. DenseT5 reference: 2 corpora x m42 (zero coverage today)
nice -n 10 python scripts/parity_headtohead.py --users 4000 --items 240 \
  --seeds 0 1 --model-seeds 42 --dense-t5-epochs 30 --no-md \
  --skip $(skip_except ref-dense-t5) \
  --workdir /tmp/parity_r3 --out artifacts/parity_r3_ref_dense_m42.json

# 2. SASRec reference extras: (1,43) (1,44) (1,45) then (0,45)
nice -n 10 python scripts/parity_headtohead.py --users 4000 --items 240 \
  --seeds 1 --model-seeds 43 44 45 --sasrec-epochs 60 --no-md \
  --skip $(skip_except ref-sasrec) \
  --workdir /tmp/parity_r3 --out artifacts/parity_r3_ref_sasrec_s1.json
nice -n 10 python scripts/parity_headtohead.py --users 4000 --items 240 \
  --seeds 0 --model-seeds 45 --sasrec-epochs 60 --no-md \
  --skip $(skip_except ref-sasrec) \
  --workdir /tmp/parity_r3 --out artifacts/parity_r3_ref_sasrec_s0m45.json

# 3. TIGER-prefix reference: corpus 1, m42 (~2h)
nice -n 10 python scripts/parity_headtohead.py --users 4000 --items 240 \
  --seeds 1 --model-seeds 42 --prefix-epochs 25 --no-md \
  --skip $(skip_except ref-tiger-prefix) \
  --workdir /tmp/parity_r3 --out artifacts/parity_r3_ref_prefix_s1.json

# 4. DenseT5 reference: 2 corpora x m43
nice -n 10 python scripts/parity_headtohead.py --users 4000 --items 240 \
  --seeds 0 1 --model-seeds 43 --dense-t5-epochs 30 --no-md \
  --skip $(skip_except ref-dense-t5) \
  --workdir /tmp/parity_r3 --out artifacts/parity_r3_ref_dense_m43.json

# 5. Stretch: TIGER-prefix reference corpus 0, m43
nice -n 10 python scripts/parity_headtohead.py --users 4000 --items 240 \
  --seeds 0 --model-seeds 43 --prefix-epochs 25 --no-md \
  --skip $(skip_except ref-tiger-prefix) \
  --workdir /tmp/parity_r3 --out artifacts/parity_r3_ref_prefix_s0m43.json

echo "R3 REF QUEUE DONE"
