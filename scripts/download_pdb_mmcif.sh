#!/usr/bin/env bash
# Mirror the PDB mmCIF archive for training-data preprocessing.
# Equivalent of the reference scripts/pdb/download_pdb_mmcif.sh (AF2's
# download script): rsync the gzipped mmCIF tree, flatten, and fetch the
# obsolete list. Requires network access + rsync.
set -euo pipefail

DOWNLOAD_DIR="${1:?usage: download_pdb_mmcif.sh <download_dir>}"
MIRROR="rsync.rcsb.org::ftp_data/structures/divided/mmCIF/"
RAW="${DOWNLOAD_DIR}/raw"
FLAT="${DOWNLOAD_DIR}/mmcif_files"

mkdir -p "${RAW}" "${FLAT}"
echo "rsyncing PDB mmCIF archive (this is ~100GB+)..."
rsync --recursive --links --perms --times --compress --info=progress2 \
      --delete --port=33444 "${MIRROR}" "${RAW}"

echo "flattening + keeping gzipped files (the preprocessor reads .cif.gz)..."
find "${RAW}" -type f -name '*.cif.gz' -exec ln -sf {} "${FLAT}/" \;

echo "fetching obsolete list..."
wget -q -O "${DOWNLOAD_DIR}/obsolete.dat" \
     "https://files.wwpdb.org/pub/pdb/data/status/obsolete.dat" || true

echo "done. preprocess with:"
echo "  python -m str2str_tpu.data.preprocess --input-dir ${FLAT} --output-dir <out>"
