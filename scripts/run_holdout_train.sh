#!/bin/bash
# Round-5 holdout training (VERDICT r4 item 4 / weak #3): train on the 10
# in-repo targets that are NOT quality-measured by crossparity, holding out
# CLN025 + NTL9 + 2JOF, so the cross-framework JS claim can be re-based on a
# checkpoint whose training never saw those targets.
#
# This is the largest honest corpus available in this environment: the image
# has no mmCIF archive and no network egress (scripts/download_pdb_mmcif.sh
# cannot run), so "past the toy" is bounded at the 13 in-repo structures;
# the holdout breaks the train-on-eval circularity, which is the part of
# the round-4 finding that was actionable here.
set -eu
cd "$(dirname "$0")/.."
OUTPUT_DIR=outputs/train_r5_holdout PYTHONUNBUFFERED=1 \
python -m str2str_tpu.cli.train \
  data.dataset.path_to_dataset=testdata data.dataset.suffix=pdb \
  'data.dataset.metadata_filter=null' \
  'data.dataset.accession_code_filter=[1FME,2F4K,2WAV,A3D,GTT,NuG2,PRB,UVF,bpti,lambda]' \
  data.batch_size=4 'data.buckets=[128]' \
  trainer.max_epochs=500 trainer.log_every_n_steps=10 \
  seed=5 "$@"
