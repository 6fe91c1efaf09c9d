"""Protein chemical constants and derived lookup tables.

Raw tables (residue vocabularies, chi-angle atom definitions, idealized
rigid-group coordinates, ...) are published AlphaFold-2 chemical data loaded
from ``data/chemical.json``. Everything else here is derived from that raw
data with numpy at import time.

Capability parity with the reference's constants layer
(``/root/reference/src/common/residue_constants.py``): same table names and
semantics where the downstream framework needs them, rebuilt from the raw
data rather than ported.
"""
from __future__ import annotations

import functools
import json
from pathlib import Path

import numpy as np

_DATA_PATH = Path(__file__).parent / "data" / "chemical.json"
_raw = json.loads(_DATA_PATH.read_text())

# ---------------------------------------------------------------------------
# Raw vocabularies.
# ---------------------------------------------------------------------------
restypes: list[str] = _raw["restypes"]
restype_order: dict[str, int] = {r: i for i, r in enumerate(restypes)}
restype_num: int = len(restypes)  # 20
unk_restype_index: int = restype_num  # 'X'
restypes_with_x: list[str] = restypes + ["X"]
restype_order_with_x: dict[str, int] = {r: i for i, r in enumerate(restypes_with_x)}

restype_1to3: dict[str, str] = _raw["restype_1to3"]
restype_3to1: dict[str, str] = {v: k for k, v in restype_1to3.items()}

atom_types: list[str] = _raw["atom_types"]
atom_order: dict[str, int] = {a: i for i, a in enumerate(atom_types)}
atom_type_num: int = len(atom_types)  # 37

restype_name_to_atom14_names: dict[str, list[str]] = _raw["restype_name_to_atom14_names"]
residue_atoms: dict[str, list[str]] = _raw["residue_atoms"]

chi_angles_atoms: dict[str, list[list[str]]] = _raw["chi_angles_atoms"]
chi_angles_mask: list[list[float]] = _raw["chi_angles_mask"]
chi_pi_periodic: list[list[float]] = _raw["chi_pi_periodic"]

rigid_group_atom_positions: dict[str, list] = _raw["rigid_group_atom_positions"]
residue_atom_renaming_swaps: dict[str, dict[str, str]] = _raw["residue_atom_renaming_swaps"]
van_der_waals_radius: dict[str, float] = _raw["van_der_waals_radius"]

between_res_bond_length_c_n = _raw["between_res_bond_length_c_n"]
between_res_bond_length_stddev_c_n = _raw["between_res_bond_length_stddev_c_n"]
between_res_cos_angles_c_n_ca = _raw["between_res_cos_angles_c_n_ca"]
between_res_cos_angles_ca_c_n = _raw["between_res_cos_angles_ca_c_n"]
ca_ca: float = _raw["ca_ca"]

CA_IDX: int = atom_order["CA"]

# Indices of the canonical backbone atoms in the atom37 vocabulary.
BACKBONE_ATOM37_IDX = tuple(atom_order[a] for a in ("N", "CA", "C", "CB", "O"))


def sequence_to_aatype(seq: str, unknown_ok: bool = True) -> np.ndarray:
    """One-letter sequence -> integer aatype array (X/unknown -> 20)."""
    idx = []
    for c in seq:
        if c in restype_order:
            idx.append(restype_order[c])
        elif unknown_ok:
            idx.append(unk_restype_index)
        else:
            raise KeyError(f"unknown residue letter {c!r}")
    return np.asarray(idx, dtype=np.int32)


def aatype_to_sequence(aatype: np.ndarray) -> str:
    return "".join(restypes_with_x[min(int(a), unk_restype_index)] for a in aatype)


# ---------------------------------------------------------------------------
# Derived per-restype lookup tables.
# ---------------------------------------------------------------------------
def _gram_schmidt_4x4(ex: np.ndarray, ey: np.ndarray, translation: np.ndarray) -> np.ndarray:
    """4x4 homogeneous transform whose x-axis is `ex` (normalized), with `ey`
    orthogonalized into the xy-plane, and z = x cross y."""
    x = ex / np.linalg.norm(ex)
    y = ey - x * np.dot(x, ey)
    y = y / np.linalg.norm(y)
    z = np.cross(x, y)
    m = np.eye(4)
    m[:3, 0], m[:3, 1], m[:3, 2], m[:3, 3] = x, y, z, translation
    return m


@functools.cache
def _derived():
    """Build every derived table in one pass over the raw data."""
    n_res = restype_num + 1  # incl. unknown
    atom37_to_group = np.zeros((n_res, atom_type_num), dtype=np.int32)
    atom37_mask = np.zeros((n_res, atom_type_num), dtype=np.float32)
    atom37_group_pos = np.zeros((n_res, atom_type_num, 3), dtype=np.float32)
    atom14_to_group = np.zeros((n_res, 14), dtype=np.int32)
    atom14_mask = np.zeros((n_res, 14), dtype=np.float32)
    atom14_group_pos = np.zeros((n_res, 14, 3), dtype=np.float32)
    default_frames = np.zeros((n_res, 8, 4, 4), dtype=np.float32)

    # atom14 <-> atom37 index maps & existence masks.
    atom14_to_atom37 = np.zeros((n_res, 14), dtype=np.int32)
    atom37_to_atom14 = np.zeros((n_res, atom_type_num), dtype=np.int32)
    atom14_exists = np.zeros((n_res, 14), dtype=np.float32)
    atom37_exists = np.zeros((n_res, atom_type_num), dtype=np.float32)

    for ri, one in enumerate(restypes):
        name3 = restype_1to3[one]

        # Idealized per-group atom coordinates.
        for atom_name, group_idx, pos in rigid_group_atom_positions[name3]:
            a37 = atom_order[atom_name]
            atom37_to_group[ri, a37] = group_idx
            atom37_mask[ri, a37] = 1.0
            atom37_group_pos[ri, a37] = pos
            a14 = restype_name_to_atom14_names[name3].index(atom_name)
            atom14_to_group[ri, a14] = group_idx
            atom14_mask[ri, a14] = 1.0
            atom14_group_pos[ri, a14] = pos

        # atom14 <-> atom37 correspondence.
        for a14, atom_name in enumerate(restype_name_to_atom14_names[name3]):
            if not atom_name:
                continue
            a37 = atom_order[atom_name]
            atom14_to_atom37[ri, a14] = a37
            atom37_to_atom14[ri, a37] = a14
            atom14_exists[ri, a14] = 1.0
        for atom_name in residue_atoms[name3]:
            atom37_exists[ri, atom_order[atom_name]] = 1.0

        # Default (zero-torsion) frames of the 8 rigid groups, expressed
        # relative to their parent frame.
        pos = {n: np.asarray(p, dtype=np.float64)
               for n, _, p in rigid_group_atom_positions[name3]}
        default_frames[ri, 0] = np.eye(4)  # backbone -> backbone
        default_frames[ri, 1] = np.eye(4)  # pre-omega (placeholder identity)
        default_frames[ri, 2] = _gram_schmidt_4x4(
            ex=pos["N"] - pos["CA"], ey=np.array([1.0, 0.0, 0.0]), translation=pos["N"])
        default_frames[ri, 3] = _gram_schmidt_4x4(
            ex=pos["C"] - pos["CA"], ey=pos["CA"] - pos["N"], translation=pos["C"])
        if chi_angles_mask[ri][0]:
            a, b, c = (pos[n] for n in chi_angles_atoms[name3][0][:3])
            default_frames[ri, 4] = _gram_schmidt_4x4(ex=c - b, ey=a - b, translation=c)
        for chi in range(1, 4):
            if chi_angles_mask[ri][chi]:
                # Chi k>1 frames chain off the previous chi frame; their
                # rotation axis starts at that frame's origin.
                end = pos[chi_angles_atoms[name3][chi][2]]
                default_frames[ri, 4 + chi] = _gram_schmidt_4x4(
                    ex=end, ey=np.array([-1.0, 0.0, 0.0]), translation=end)

    # Chi-angle atom37 indices: [21, 4, 4].
    chi_atom37_indices = np.zeros((n_res, 4, 4), dtype=np.int32)
    chi_mask = np.zeros((n_res, 4), dtype=np.float32)
    for ri, one in enumerate(restypes):
        name3 = restype_1to3[one]
        for chi, atoms in enumerate(chi_angles_atoms[name3]):
            chi_atom37_indices[ri, chi] = [atom_order[a] for a in atoms]
            chi_mask[ri, chi] = 1.0

    # Frame-building base atoms for atom37_to_frames: [21, 8, 3] atom37 idx
    # plus per-(restype, group) existence.
    frame_base_atom37_idx = np.zeros((n_res, 8, 3), dtype=np.int32)
    group_mask = np.zeros((n_res, 8), dtype=np.float32)
    frame_base_atom37_idx[:, 0] = [atom_order[a] for a in ("C", "CA", "N")]
    frame_base_atom37_idx[:, 3] = [atom_order[a] for a in ("CA", "C", "O")]
    group_mask[:, 0] = 1.0
    group_mask[:, 3] = 1.0
    for ri, one in enumerate(restypes):
        name3 = restype_1to3[one]
        for chi in range(4):
            if chi_angles_mask[ri][chi]:
                names = chi_angles_atoms[name3][chi][1:]
                frame_base_atom37_idx[ri, 4 + chi] = [atom_order[a] for a in names]
                group_mask[ri, 4 + chi] = 1.0

    # Ambiguous chi-group flip rotations (180-deg symmetric terminal groups).
    group_is_ambiguous = np.zeros((n_res, 8), dtype=np.float32)
    ambiguity_rot = np.tile(np.eye(3, dtype=np.float32), (n_res, 8, 1, 1))
    for name3 in residue_atom_renaming_swaps:
        ri = restype_order[restype_3to1[name3]]
        last_chi = int(sum(chi_angles_mask[ri])) - 1
        group_is_ambiguous[ri, 4 + last_chi] = 1.0
        ambiguity_rot[ri, 4 + last_chi, 1, 1] = -1.0
        ambiguity_rot[ri, 4 + last_chi, 2, 2] = -1.0

    # Ambiguous atom swap maps on atom14: identity permutation except swapped
    # pairs, per restype.
    atom14_ambiguous = np.zeros((n_res, 14), dtype=np.float32)
    atom14_swap_index = np.tile(np.arange(14, dtype=np.int32), (n_res, 1))
    for name3, swaps in residue_atom_renaming_swaps.items():
        ri = restype_order[restype_3to1[name3]]
        names = restype_name_to_atom14_names[name3]
        for a, b in swaps.items():
            ia, ib = names.index(a), names.index(b)
            atom14_swap_index[ri, ia], atom14_swap_index[ri, ib] = ib, ia
            atom14_ambiguous[ri, ia] = atom14_ambiguous[ri, ib] = 1.0

    return dict(
        restype_atom37_to_rigid_group=atom37_to_group,
        restype_atom37_mask=atom37_mask,
        restype_atom37_rigid_group_positions=atom37_group_pos,
        restype_atom14_to_rigid_group=atom14_to_group,
        restype_atom14_mask=atom14_mask,
        restype_atom14_rigid_group_positions=atom14_group_pos,
        restype_rigid_group_default_frame=default_frames,
        restype_atom14_to_atom37=atom14_to_atom37,
        restype_atom37_to_atom14=atom37_to_atom14,
        restype_atom14_exists=atom14_exists,
        restype_atom37_exists=atom37_exists,
        chi_atom37_indices=chi_atom37_indices,
        chi_angles_mask_array=chi_mask,
        frame_base_atom37_idx=frame_base_atom37_idx,
        rigid_group_mask=group_mask,
        rigid_group_is_ambiguous=group_is_ambiguous,
        rigid_group_ambiguity_rot=ambiguity_rot,
        restype_atom14_ambiguous=atom14_ambiguous,
        restype_atom14_swap_index=atom14_swap_index,
    )


def __getattr__(name: str):
    tables = _derived()
    if name in tables:
        return tables[name]
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
