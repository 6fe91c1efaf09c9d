"""Offline preprocessing: mmCIF/PDB -> per-chain pickles + metadata CSV.

Capability parity with the reference preprocessing script
(`/root/reference/scripts/pdb/preprocess.py:240-519`): resolution/length
filters, optional PISCES culled-list subsetting, per-chain feature pickles
sharded by the PDB id's middle two characters, a pandas metadata CSV, and a
multiprocessing fan-out.

Usage:
    python -m str2str_tpu.data.preprocess --input-dir /path/mmcif \
        --output-dir /path/processed [--pisces file] [--max-resolution 5.0]
"""
from __future__ import annotations

import argparse
import multiprocessing as mp
import pickle
from functools import partial
from glob import glob
from pathlib import Path
from typing import List, Optional

import numpy as np

from ..geometry import chemical as ch
from ..io import mmcif
from ..io.protein import Protein, from_pdb_string
from ..utils.logging import get_logger

log = get_logger(__name__)


def parse_pisces(path: str) -> dict:
    """PISCES culled list -> {pdb_id(lower): set(chain ids)}."""
    targets: dict = {}
    for line in Path(path).read_text().splitlines()[1:]:
        tok = line.split()
        if not tok:
            continue
        pdb_chain = tok[0]
        pdb_id, chain = pdb_chain[:4].lower(), pdb_chain[4:]
        targets.setdefault(pdb_id, set()).add(chain)
    return targets


def chain_metadata(prot: Protein, code: str, resolution, method,
                   with_ss: bool = True) -> dict:
    ca_mask = prot.atom_mask[:, ch.CA_IDX]
    row = {
        "accession_code": code,
        "seq_len": int(prot.num_residues),
        "modeled_len": int(ca_mask.sum()),
        "resolution": resolution if resolution is not None else np.nan,
        "method": method,
        "num_chains": int(len(np.unique(prot.chain_index))),
    }
    if with_ss:
        # DSSP-style SS percentages + Rg (reference preprocess.py:200-227
        # via mdtraj; first-party Kabsch-Sander here).
        from .secondary import radius_of_gyration, secondary_structure_percents
        row.update(secondary_structure_percents(prot.atom_positions,
                                                prot.atom_mask))
        row["radius_gyration"] = radius_of_gyration(prot.atom_positions,
                                                    prot.atom_mask)
    return row


def process_file(path: str, output_dir: str, pisces: Optional[dict] = None,
                 max_resolution: Optional[float] = 5.0,
                 min_len: int = 10, max_len: Optional[int] = None,
                 max_oligomer: Optional[int] = None,
                 with_ss: bool = True) -> List[dict]:
    """One mmCIF/PDB file -> per-chain pickles. Returns metadata rows."""
    p = Path(path)
    stem = p.name.split(".")[0].lower()
    rows = []
    oligomeric_count = None
    # PISCES membership depends only on the filename stem: check it BEFORE
    # the mmCIF parse (the dominant cost) so a culled list that keeps a few
    # percent of the archive skips >90% of the parsing work.
    if pisces is not None and stem not in pisces:
        return rows
    try:
        if ".cif" in p.suffixes or p.suffix == ".cif":
            obj = mmcif.parse_mmcif(p)
            resolution, method = obj.header.resolution, obj.header.method
            oligomeric_count = obj.header.oligomeric_count
            chains = obj.chains
        else:
            prot = from_pdb_string(p.read_text())
            resolution, method = None, ""
            chains = {"A": prot}
    except Exception as e:
        log.warning(f"[{stem}] parse failed: {e}")
        return rows

    if (max_resolution is not None and resolution is not None
            and resolution > max_resolution):
        return rows
    # Oligomeric filter (reference preprocess.py:316-327).
    if (max_oligomer is not None and oligomeric_count is not None
            and oligomeric_count > max_oligomer):
        return rows

    for chain_id, prot in chains.items():
        if pisces is not None and chain_id not in pisces.get(stem, set()):
            continue
        modeled = np.where(prot.aatype != ch.unk_restype_index)[0]
        if modeled.size == 0:
            continue
        n = prot.num_residues
        if n < min_len or (max_len is not None and n > max_len):
            continue
        code = f"{stem}_{chain_id}"
        shard = Path(output_dir) / stem[1:3]
        shard.mkdir(parents=True, exist_ok=True)
        out_path = shard / f"{code}.pkl"
        with open(out_path, "wb") as f:
            pickle.dump({
                "atom_positions": prot.atom_positions,
                "atom_mask": prot.atom_mask,
                "aatype": prot.aatype,
                "residue_index": prot.residue_index,
                "chain_index": prot.chain_index,
                "b_factors": prot.b_factors,
            }, f)
        row = chain_metadata(prot, code, resolution, method, with_ss=with_ss)
        row["oligomeric_count"] = oligomeric_count
        row["processed_path"] = str(out_path)
        rows.append(row)
    return rows


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input-dir", required=True,
                    help="directory of .cif/.cif.gz/.pdb files")
    ap.add_argument("--output-dir", required=True)
    ap.add_argument("--pisces", default=None, help="PISCES culled list file")
    ap.add_argument("--max-resolution", type=float, default=5.0)
    ap.add_argument("--min-len", type=int, default=10)
    ap.add_argument("--max-len", type=int, default=None)
    ap.add_argument("--max-oligomer", type=int, default=None,
                    help="skip assemblies with more subunits than this")
    ap.add_argument("--no-ss", action="store_true",
                    help="skip secondary-structure/Rg metadata columns")
    ap.add_argument("--num-workers", type=int, default=mp.cpu_count())
    ap.add_argument("--max-file-size", type=int, default=50_000_000)
    args = ap.parse_args(argv)

    files = sorted(
        glob(str(Path(args.input_dir) / "**/*.cif"), recursive=True)
        + glob(str(Path(args.input_dir) / "**/*.cif.gz"), recursive=True)
        + glob(str(Path(args.input_dir) / "**/*.pdb"), recursive=True))
    files = [f for f in files if Path(f).stat().st_size <= args.max_file_size]
    log.info(f"{len(files)} structure files to process")

    pisces = parse_pisces(args.pisces) if args.pisces else None
    fn = partial(process_file, output_dir=args.output_dir, pisces=pisces,
                 max_resolution=args.max_resolution, min_len=args.min_len,
                 max_len=args.max_len, max_oligomer=args.max_oligomer,
                 with_ss=not args.no_ss)
    if args.num_workers > 1:
        with mp.Pool(args.num_workers) as pool:
            results = pool.map(fn, files)
    else:
        results = [fn(f) for f in files]

    rows = [r for rs in results for r in rs]
    import pandas as pd
    df = pd.DataFrame(rows)
    csv_path = Path(args.output_dir) / "metadata.csv"
    df.to_csv(csv_path, index=False)
    log.info(f"wrote {len(rows)} chains; metadata at {csv_path}")


if __name__ == "__main__":
    main()
