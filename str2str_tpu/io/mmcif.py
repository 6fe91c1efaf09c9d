"""Minimal mmCIF parsing for training-data preprocessing.

First-party replacement for the reference's BioPython-backed mmCIF pipeline
(`/root/reference/scripts/pdb/mmcif_parsing.py`): tokenizes the CIF data
blocks we need — `_atom_site` records (first model), resolution fields,
experimental method, release date — and produces per-chain `Protein` objects.

Not a general CIF library: quoted tokens and loop_ tables are handled, exotic
multi-datablock files take the first block.
"""
from __future__ import annotations

import dataclasses
import gzip
import re
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np

from ..geometry import chemical as ch
from .protein import Protein

_TOKEN = re.compile(r"'[^']*'|\"[^\"]*\"|\S+")


def _tokens(line: str) -> List[str]:
    return [t[1:-1] if t[0] in "'\"" else t for t in _TOKEN.findall(line)]


@dataclasses.dataclass
class MmcifHeader:
    entry_id: str = ""
    resolution: Optional[float] = None
    method: str = ""
    release_date: str = ""
    oligomeric_count: Optional[int] = None


@dataclasses.dataclass
class MmcifObject:
    header: MmcifHeader
    chains: Dict[str, Protein]


def _read_text(path: str | Path) -> str:
    path = Path(path)
    if path.suffix == ".gz":
        with gzip.open(path, "rt") as f:
            return f.read()
    return path.read_text()


_RESOLUTION_KEYS = (
    "_refine.ls_d_res_high",
    "_em_3d_reconstruction.resolution",
    "_reflns.d_resolution_high",
)


def parse_mmcif(path: str | Path) -> MmcifObject:
    text = _read_text(path)
    lines = text.splitlines()

    header = MmcifHeader()
    scalars: Dict[str, str] = {}
    atom_cols: List[str] = []
    atom_rows: List[List[str]] = []
    # Loops needed for the SEQRES<->ATOM mapping (reference
    # mmcif_parsing.py:165 builds seqres_to_structure from _entity_poly_seq
    # and _struct_asym).
    KEPT = ("_atom_site.", "_entity_poly_seq.", "_struct_asym.")
    kept_loops: Dict[str, tuple] = {}

    i = 0
    n = len(lines)
    while i < n:
        line = lines[i].strip()
        if line.startswith("data_") and header.entry_id:
            break  # second data block: stop
        if line.startswith("data_"):
            header.entry_id = line[5:].strip().lower()
            i += 1
            continue
        if line.startswith("loop_"):
            # Collect the column headers of this loop.
            i += 1
            cols = []
            while i < n and lines[i].strip().startswith("_"):
                cols.append(lines[i].strip().split()[0])
                i += 1
            category = next((k for k in KEPT
                             if cols and cols[0].startswith(k)), None)
            loop_rows: List[List[str]] = []
            # Walk the data rows.
            while i < n:
                row_line = lines[i].strip()
                if (not row_line or row_line.startswith("#")
                        or row_line.startswith("loop_")
                        or row_line.startswith("_")
                        or row_line.startswith("data_")):
                    break
                if category:
                    toks = _tokens(row_line)
                    if len(toks) == len(cols):
                        loop_rows.append(toks)
                i += 1
            if category == "_atom_site.":
                atom_cols, atom_rows = cols, loop_rows
            elif category:
                kept_loops[category] = (cols, loop_rows)
            continue
        if line.startswith("_"):
            toks = _tokens(line)
            if len(toks) >= 2:
                scalars[toks[0]] = toks[1]
            elif len(toks) == 1 and i + 1 < n:
                nxt = lines[i + 1].strip()
                if nxt and not nxt.startswith(("_", "#", "loop_")):
                    scalars[toks[0]] = _tokens(nxt)[0] if _tokens(nxt) else ""
                    i += 1
            i += 1
            continue
        i += 1

    for key in _RESOLUTION_KEYS:
        if key in scalars:
            try:
                header.resolution = float(scalars[key])
                break
            except ValueError:
                pass
    header.method = scalars.get("_exptl.method", "")
    header.release_date = scalars.get(
        "_pdbx_audit_revision_history.revision_date",
        scalars.get("_database_PDB_rev.date_original", ""))
    try:
        header.oligomeric_count = int(scalars.get(
            "_pdbx_struct_assembly.oligomeric_count", ""))
    except ValueError:
        header.oligomeric_count = None

    entity_seq = _parse_entity_poly_seq(kept_loops.get("_entity_poly_seq."))
    asym_to_entity = _parse_struct_asym(kept_loops.get("_struct_asym."))
    chains = _atom_site_to_chains(atom_cols, atom_rows,
                                  entity_seq=entity_seq,
                                  asym_to_entity=asym_to_entity)
    return MmcifObject(header=header, chains=chains)


def _parse_entity_poly_seq(loop) -> Dict[str, Dict[int, str]]:
    """entity_id -> {seq num -> 3-letter mon_id} (the mmCIF SEQRES)."""
    if not loop:
        return {}
    cols, rows = loop
    idx = {c.split(".", 1)[1]: j for j, c in enumerate(cols)}
    out: Dict[str, Dict[int, str]] = {}
    for row in rows:
        try:
            num = int(row[idx["num"]])
        except (KeyError, ValueError):
            continue
        ent = row[idx["entity_id"]]
        # Heterogeneous positions (microheterogeneity) keep the first mon_id,
        # matching the reference parser's behavior.
        out.setdefault(ent, {}).setdefault(num, row[idx["mon_id"]])
    return out


def _parse_struct_asym(loop) -> Dict[str, str]:
    """label_asym_id -> entity_id."""
    if not loop:
        return {}
    cols, rows = loop
    idx = {c.split(".", 1)[1]: j for j, c in enumerate(cols)}
    try:
        return {row[idx["id"]]: row[idx["entity_id"]] for row in rows}
    except KeyError:
        return {}


def _atom_site_to_chains(cols: List[str], rows: List[List[str]],
                         entity_seq: Optional[Dict[str, Dict[int, str]]] = None,
                         asym_to_entity: Optional[Dict[str, str]] = None
                         ) -> Dict[str, Protein]:
    """Build per-chain Proteins. When the file carries `_entity_poly_seq`
    (SEQRES), each chain spans the FULL polymer sequence with unresolved
    residues zero-masked — the reference's seqres_to_structure semantics
    (mmcif_parsing.py:165,229-258); otherwise only resolved residues appear.
    """
    if not rows:
        return {}
    idx = {c.split(".", 1)[1]: j for j, c in enumerate(cols)}

    def get(row, key, default=""):
        j = idx.get(key)
        return row[j] if j is not None else default

    per_chain: Dict[str, dict] = {}
    chain_entity: Dict[str, str] = {}
    first_model = None
    for row in rows:
        if get(row, "group_PDB") not in ("ATOM", "HETATM"):
            continue
        model = get(row, "pdbx_PDB_model_num", "1")
        if first_model is None:
            first_model = model
        if model != first_model:
            continue
        comp = get(row, "label_comp_id")
        if get(row, "group_PDB") == "HETATM" and comp != "MSE":
            continue
        resname = "MET" if comp == "MSE" else comp
        if resname not in ch.restype_3to1:
            continue
        atom = get(row, "label_atom_id")
        atom = "SD" if (comp == "MSE" and atom == "SE") else atom
        if atom not in ch.atom_order:
            continue
        alt = get(row, "label_alt_id", ".")
        if alt not in (".", "A", "1", ""):
            continue
        chain_id = get(row, "auth_asym_id") or get(row, "label_asym_id")
        label_asym = get(row, "label_asym_id")
        if chain_id not in chain_entity and asym_to_entity:
            chain_entity[chain_id] = asym_to_entity.get(label_asym, "")
        seq_id = get(row, "label_seq_id")
        if seq_id in (".", "?", ""):
            seq_id = get(row, "auth_seq_id")
        try:
            seq_id = int(seq_id)
        except ValueError:
            continue
        c = per_chain.setdefault(chain_id, {})
        r = c.setdefault(seq_id, {"resname": resname, "atoms": {}})
        try:
            xyz = (float(get(row, "Cartn_x")), float(get(row, "Cartn_y")),
                   float(get(row, "Cartn_z")))
        except ValueError:
            continue
        bfac = get(row, "B_iso_or_equiv", "0")
        r["atoms"].setdefault(atom, (xyz, float(bfac) if bfac not in (".", "?") else 0.0))

    chains: Dict[str, Protein] = {}
    for ci, (chain_id, residues) in enumerate(per_chain.items()):
        # SEQRES mapping: span the full polymer sequence; residues without
        # coordinates stay zero-masked (skip if the resolved residues
        # disagree with the sequence — auth-numbered fallback files).
        seq = (entity_seq or {}).get(chain_entity.get(chain_id, ""), {})
        if seq and all(
                seq.get(k, "") == v["resname"]
                or (seq.get(k) == "MSE" and v["resname"] == "MET")
                for k, v in residues.items()):
            full = {}
            for num in sorted(seq):
                resname = "MET" if seq[num] == "MSE" else seq[num]
                if resname not in ch.restype_3to1:
                    resname = "UNK"
                full[num] = residues.get(num, {"resname": resname, "atoms": {}})
            residues = full
        keys = sorted(residues)
        m = len(keys)
        pos = np.zeros((m, ch.atom_type_num, 3), np.float32)
        mask = np.zeros((m, ch.atom_type_num), np.float32)
        bfac = np.zeros((m, ch.atom_type_num), np.float32)
        aatype = np.full((m,), ch.unk_restype_index, np.int32)
        res_index = np.zeros((m,), np.int32)
        for k, seq_id in enumerate(keys):
            entry = residues[seq_id]
            res_index[k] = seq_id
            one = ch.restype_3to1.get(entry["resname"])
            if one:
                aatype[k] = ch.restype_order[one]
            for atom, (xyz, b) in entry["atoms"].items():
                j = ch.atom_order[atom]
                pos[k, j] = xyz
                mask[k, j] = 1.0
                bfac[k, j] = b
        chains[chain_id] = Protein(pos, mask, aatype, res_index,
                                   np.full((m,), ci, np.int32), bfac)
    return chains
