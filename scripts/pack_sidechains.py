#!/usr/bin/env python
"""Side-chain packing of sampled backbones with FASPR.

Capability parity with the reference `scripts/pack.py`: turn backbone-only
sampled ensembles into full heavy-atom structures by running the external
FASPR C++ binary per model, in parallel. FASPR is an external tool (same for
the reference); build it with:

    git clone https://github.com/tommyhuangthu/FASPR && cd FASPR
    g++ -O3 --fast-math -o FASPR src/*.cpp

Usage:
    python scripts/pack_sidechains.py --input ensemble.pdb --output packed.pdb \
        --faspr /path/to/FASPR [--workers 8]
"""
from __future__ import annotations

import argparse
import multiprocessing as mp
import shutil
import subprocess
import sys
import tempfile
from functools import partial
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def _pack_one(model_path: str, faspr: str) -> str:
    out_path = model_path.replace(".pdb", "_packed.pdb")
    subprocess.run([faspr, "-i", model_path, "-o", out_path],
                   check=True, capture_output=True)
    return out_path


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True, help="(multi-model) PDB to pack")
    ap.add_argument("--output", required=True)
    ap.add_argument("--faspr", default=shutil.which("FASPR"),
                    help="path to the FASPR binary")
    ap.add_argument("--workers", type=int, default=mp.cpu_count())
    args = ap.parse_args(argv)

    if not args.faspr or not Path(args.faspr).exists():
        sys.exit("FASPR binary not found — pass --faspr /path/to/FASPR "
                 "(build instructions in this script's docstring).")

    from str2str_tpu.io import pdb as pdb_io

    with tempfile.TemporaryDirectory() as tmp:
        model_paths = pdb_io.split_pdbfile(args.input, tmp)
        print(f"packing {len(model_paths)} models with {args.workers} workers")
        fn = partial(_pack_one, faspr=args.faspr)
        if args.workers > 1:
            with mp.Pool(args.workers) as pool:
                packed = pool.map(fn, model_paths)
        else:
            packed = [fn(p) for p in model_paths]
        pdb_io.merge_pdbfiles(packed, args.output)
    print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
