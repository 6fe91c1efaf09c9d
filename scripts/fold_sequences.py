#!/usr/bin/env python
"""Fold sequences to initial structures with ESMFold.

Capability parity with the reference `scripts/fold.py`: produce the ESMFolded
input structures used for zero-shot sampling, from a FASTA file or from the
sequences of existing PDBs. Requires the `esm` package (and a GPU/TPU-capable
torch) which is NOT shipped in this image — the script degrades to a clear
error with install instructions.

Usage:
    python scripts/fold_sequences.py --fasta seqs.fasta --output-dir folded/
    python scripts/fold_sequences.py --pdb-dir inputs/ --output-dir folded/
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def read_fasta(path: str) -> dict:
    seqs, name = {}, None
    for line in Path(path).read_text().splitlines():
        line = line.strip()
        if line.startswith(">"):
            name = line[1:].split()[0]
            seqs[name] = ""
        elif name:
            seqs[name] += line
    return seqs


def sequences_from_pdbs(pdb_dir: str) -> dict:
    from str2str_tpu.io.protein import from_pdb_string
    seqs = {}
    for p in sorted(Path(pdb_dir).glob("*.pdb")):
        seqs[p.stem] = from_pdb_string(p.read_text()).sequence()
    return seqs


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    g = ap.add_mutually_exclusive_group(required=True)
    g.add_argument("--fasta")
    g.add_argument("--pdb-dir")
    ap.add_argument("--output-dir", required=True)
    ap.add_argument("--chunk-size", type=int, default=None,
                    help="axial attention chunking for long sequences")
    args = ap.parse_args(argv)

    seqs = read_fasta(args.fasta) if args.fasta else sequences_from_pdbs(args.pdb_dir)
    print(f"{len(seqs)} sequences to fold")

    try:
        import esm  # noqa: F401
        import torch
    except ImportError:
        sys.exit(
            "ESMFold is not installed in this environment.\n"
            "Install with:  pip install fair-esm[esmfold] 'torch>=1.12'\n"
            "Then re-run this script. (The reference has the same external "
            "dependency; see its scripts/fold.py.)")

    model = esm.pretrained.esmfold_v1().eval()
    if torch.cuda.is_available():
        model = model.cuda()
    if args.chunk_size:
        model.set_chunk_size(args.chunk_size)

    out_dir = Path(args.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    for name, seq in seqs.items():
        with torch.no_grad():
            pdb_str = model.infer_pdb(seq)
        (out_dir / f"{name}.pdb").write_text(pdb_str)
        print(f"folded {name} ({len(seq)} aa)")


if __name__ == "__main__":
    main()
