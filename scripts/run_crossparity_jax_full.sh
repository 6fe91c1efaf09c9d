#!/bin/bash
# Full-protocol (T=int(1000*delta)) TPU-side crossparity phases: 2 seeds x
# 500 conformations per target. All three targets share the L_pad=64 bucket,
# so the chained schedule compiles once (2 programs: 1000-step chunk +
# remainder) and is reused across targets and seeds.
set -eu
cd "$(dirname "$0")/.."
for tgt in "$@"; do
  echo "=== jax phase: $tgt ==="
  PYTHONUNBUFFERED=1 python scripts/crossparity.py \
    --phase jax \
    --target "testdata/${tgt}.pdb" \
    --out "outputs/crossparity_full/${tgt}" \
    --n-replica 50 \
    --num-timesteps 1000
done
