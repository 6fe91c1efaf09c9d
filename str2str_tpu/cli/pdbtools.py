"""PDB ensemble utilities CLI: merge / split / subsample multi-model files.

Parity with the reference's pdb_utils command-line interface
(`/root/reference/src/common/pdb_utils.py:320-352`).

Usage:
    python -m str2str_tpu.cli.pdbtools merge out.pdb in1.pdb in2.pdb ...
    python -m str2str_tpu.cli.pdbtools split ensemble.pdb out_dir/
    python -m str2str_tpu.cli.pdbtools sample ensemble.pdb out.pdb --n 100
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO))

from ..io import pdb as pdb_io


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("merge", help="concatenate models of several PDBs")
    p.add_argument("output")
    p.add_argument("inputs", nargs="+")

    p = sub.add_parser("split", help="split a multi-model PDB into files")
    p.add_argument("input")
    p.add_argument("out_dir")

    p = sub.add_parser("sample", help="stratified subsample of an ensemble")
    p.add_argument("input")
    p.add_argument("output")
    p.add_argument("--n", type=int, required=True)
    p.add_argument("--seed", type=int, default=0)

    args = ap.parse_args(argv)
    if args.cmd == "merge":
        out = pdb_io.merge_pdbfiles(args.inputs, args.output)
        print(f"merged {len(args.inputs)} files -> {out}")
    elif args.cmd == "split":
        outs = pdb_io.split_pdbfile(args.input, args.out_dir)
        print(f"split into {len(outs)} models under {args.out_dir}")
    elif args.cmd == "sample":
        out = pdb_io.stratify_sample_pdbfile(args.input, args.output,
                                             args.n, seed=args.seed)
        print(f"subsampled -> {out}")


if __name__ == "__main__":
    main()
