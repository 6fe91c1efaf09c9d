"""Protein structure representation and PDB text I/O.

First-party replacement for the reference's BioPython/biotite-backed layer
(`/root/reference/src/common/protein.py`, `pdb_utils.py`): a `Protein`
dataclass over atom37 numpy arrays, a tolerant fixed-column PDB parser
(multi-MODEL aware), and a writer emitting MODEL/TER/END records.
"""
from __future__ import annotations

import dataclasses
import io as _io
from typing import List, Optional

import numpy as np

from ..geometry import chemical as ch

PDB_CHAIN_IDS = "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789"
PDB_MAX_CHAINS = len(PDB_CHAIN_IDS)


@dataclasses.dataclass
class Protein:
    """Single structure (or one model of an ensemble) in atom37 layout."""
    atom_positions: np.ndarray  # (N, 37, 3)
    atom_mask: np.ndarray       # (N, 37)
    aatype: np.ndarray          # (N,) int, 0-19 + 20 for unknown
    residue_index: np.ndarray   # (N,) int, as authored in the PDB
    chain_index: np.ndarray     # (N,) int
    b_factors: np.ndarray       # (N, 37)

    def __post_init__(self):
        if len(np.unique(self.chain_index)) > PDB_MAX_CHAINS:
            raise ValueError(f"more than {PDB_MAX_CHAINS} chains")

    @property
    def num_residues(self) -> int:
        return int(self.aatype.shape[0])

    def sequence(self) -> str:
        return ch.aatype_to_sequence(self.aatype)


def _parse_atom_line(line: str):
    """Fixed-column ATOM record fields."""
    return {
        "atom_name": line[12:16].strip(),
        "altloc": line[16],
        "resname": line[17:20].strip(),
        "chain_id": line[21],
        "resseq": int(line[22:26]),
        "icode": line[26].strip(),
        "x": float(line[30:38]),
        "y": float(line[38:46]),
        "z": float(line[46:54]),
        "bfactor": float(line[60:66]) if line[60:66].strip() else 0.0,
    }


def from_pdb_string(pdb_str: str, chain_id: Optional[str] = None,
                    model: int = 0) -> Protein:
    """Parse one model of a PDB file into a Protein."""
    models = parse_pdb_models(pdb_str, chain_id=chain_id, max_models=model + 1)
    if not models:
        raise ValueError("no ATOM records found")
    return models[model]


def parse_pdb_models(pdb_str: str, chain_id: Optional[str] = None,
                     max_models: Optional[int] = None) -> List[Protein]:
    """Parse every MODEL of a (possibly multi-model) PDB string."""
    models: List[Protein] = []
    cur: dict | None = None          # residue accumulator for current model
    order: list = []                 # residue keys in file order
    residues: dict = {}

    def flush_model():
        nonlocal order, residues
        if order:
            models.append(_residues_to_protein(order, residues))
        order, residues = [], {}

    for line in pdb_str.splitlines():
        rec = line[:6]
        if rec == "ENDMDL" or (rec.startswith("MODEL") and residues):
            flush_model()
            if max_models is not None and len(models) >= max_models:
                return models
        if rec != "ATOM  " and rec != "HETATM":
            continue
        if rec == "HETATM" and line[17:20].strip() != "MSE":
            continue  # keep selenomethionine, skip other het groups
        f = _parse_atom_line(line)
        if chain_id is not None and f["chain_id"] != chain_id:
            continue
        if f["altloc"] not in (" ", "A", "1"):
            continue
        resname = "MET" if f["resname"] == "MSE" else f["resname"]
        atom_name = "SD" if (f["resname"] == "MSE" and f["atom_name"] == "SE") \
            else f["atom_name"]
        if atom_name not in ch.atom_order:
            continue  # hydrogens / nonstandard atoms
        key = (f["chain_id"], f["resseq"], f["icode"])
        if key not in residues:
            residues[key] = {"resname": resname, "atoms": {}}
            order.append(key)
        residues[key]["atoms"].setdefault(
            atom_name, (f["x"], f["y"], f["z"], f["bfactor"]))

    flush_model()
    return models


def _residues_to_protein(order: list, residues: dict) -> Protein:
    n = len(order)
    pos = np.zeros((n, ch.atom_type_num, 3), dtype=np.float32)
    mask = np.zeros((n, ch.atom_type_num), dtype=np.float32)
    bfac = np.zeros((n, ch.atom_type_num), dtype=np.float32)
    aatype = np.full((n,), ch.unk_restype_index, dtype=np.int32)
    res_index = np.zeros((n,), dtype=np.int32)
    chain_index = np.zeros((n,), dtype=np.int32)

    chain_ids = []
    for i, key in enumerate(order):
        cid, resseq, _ = key
        if cid not in chain_ids:
            chain_ids.append(cid)
        chain_index[i] = chain_ids.index(cid)
        res_index[i] = resseq
        entry = residues[key]
        one = ch.restype_3to1.get(entry["resname"])
        if one is not None:
            aatype[i] = ch.restype_order[one]
        for atom_name, (x, y, z, b) in entry["atoms"].items():
            j = ch.atom_order[atom_name]
            pos[i, j] = (x, y, z)
            mask[i, j] = 1.0
            bfac[i, j] = b
    return Protein(pos, mask, aatype, res_index, chain_index, bfac)


def to_pdb(proteins: Protein | List[Protein]) -> str:
    """Serialize one Protein (or a list = multi-MODEL ensemble) to PDB text."""
    if isinstance(proteins, Protein):
        proteins = [proteins]
    out = _io.StringIO()
    multi = len(proteins) > 1
    serial = 1
    for mi, prot in enumerate(proteins):
        if multi:
            out.write(f"MODEL     {mi + 1:4d}\n")
            serial = 1
        serial = _write_model(out, prot, serial)
        if multi:
            out.write("ENDMDL\n")
    out.write("END\n")
    return out.getvalue()


def _write_model(out, prot: Protein, serial: int) -> int:
    aatype = np.asarray(prot.aatype)
    prev_chain = None
    prev_name3, prev_resi = "UNK", 0
    for i in range(aatype.shape[0]):
        restype = int(aatype[i])
        name3 = (ch.restype_1to3[ch.restypes[restype]]
                 if restype < ch.restype_num else "UNK")
        cid = PDB_CHAIN_IDS[int(prot.chain_index[i]) % PDB_MAX_CHAINS]
        if prev_chain is not None and cid != prev_chain:
            # TER carries the LAST residue of the chain being terminated
            # (reference protein.py:147 _chain_end), not the next chain's
            # first residue.
            out.write(f"TER   {serial:5d}      {prev_name3} {prev_chain}"
                      f"{prev_resi:4d}\n")
            serial += 1
        prev_chain = cid
        prev_name3, prev_resi = name3, int(prot.residue_index[i])
        for j in range(ch.atom_type_num):
            if prot.atom_mask[i, j] < 0.5:
                continue
            atom_name = ch.atom_types[j]
            # Column-4 alignment: 1-3 char names start at column 14.
            name_field = atom_name if len(atom_name) == 4 else f" {atom_name:<3}"
            x, y, z = prot.atom_positions[i, j]
            b = prot.b_factors[i, j]
            element = atom_name[0]
            out.write(
                f"ATOM  {serial:5d} {name_field} {name3} {cid}"
                f"{int(prot.residue_index[i]):4d}    "
                f"{x:8.3f}{y:8.3f}{z:8.3f}{1.0:6.2f}{b:6.2f}"
                f"          {element:>2}\n")
            serial += 1
    out.write(f"TER   {serial:5d}      {prev_name3} {prev_chain}"
              f"{prev_resi:4d}\n")
    return serial + 1


def ideal_atom_mask(prot: Protein) -> np.ndarray:
    """Atoms that should chemically exist for each residue."""
    return ch.restype_atom37_exists[np.clip(prot.aatype, 0, ch.unk_restype_index)]
