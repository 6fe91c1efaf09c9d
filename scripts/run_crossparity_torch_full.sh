#!/bin/bash
# Full-protocol (T=int(1000*delta)) reference-torch crossparity phases,
# sequential, smallest-first. BPTI (L=58) is excluded by measurement: 11.3
# s/forward(B=50) on this single-core host -> ~15 h for the torch phase
# alone (scripts/probe_torch_rate.py), which does not fit a round.
set -u
cd "$(dirname "$0")/.."
mkdir -p outputs/crossparity_full
for tgt in CLN025 2JOF NTL9; do
  echo "=== torch phase: $tgt (T=1000 protocol, 500 conf) ==="
  python scripts/crossparity.py \
    --phase torch \
    --target "testdata/${tgt}.pdb" \
    --out "outputs/crossparity_full/${tgt}" \
    --n-replica 50 \
    --num-timesteps 1000 \
    >> "outputs/crossparity_full/${tgt}_torch.log" 2>&1
  echo "=== done: $tgt (exit $?) ==="
done
