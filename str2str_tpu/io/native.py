"""ctypes bindings for the native (C++) PDB ensemble parser.

Builds `native/pdbparse.cc` on demand with g++ (cached by source hash under
the framework cache dir), injects the chemistry vocabularies from
`geometry.chemical`, and exposes `parse_pdb_ensemble`. Falls back cleanly
when no compiler is available — callers check `is_available()`.
"""
from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
from pathlib import Path
from typing import List, Optional

import numpy as np

from ..geometry import chemical as ch

_SRC = Path(__file__).resolve().parents[2] / "native" / "pdbparse.cc"
_CACHE = Path(os.environ.get("STR2STR_CACHE_DIR",
                             str(Path.home() / ".cache" / "str2str_tpu"))) / "native"

_lib: Optional[ctypes.CDLL] = None
_load_error: Optional[str] = None


def _build() -> Path:
    src = _SRC.read_bytes()
    tag = hashlib.sha1(src).hexdigest()[:16]
    out = _CACHE / f"pdbparse_{tag}.so"
    if out.exists():
        return out
    _CACHE.mkdir(parents=True, exist_ok=True)
    tmp = out.with_suffix(".tmp.so")
    subprocess.run(
        ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
         str(_SRC), "-o", str(tmp)],
        check=True, capture_output=True)
    os.replace(tmp, out)
    return out


def _get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _load_error
    if _lib is not None or _load_error is not None:
        return _lib
    try:
        lib = ctypes.CDLL(str(_build()))
    except Exception as e:  # no compiler / load failure -> python fallback
        _load_error = str(e)
        return None

    lib.pdb_set_tables.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int, ctypes.c_int]
    lib.pdb_scan.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.POINTER(ctypes.c_int64)]
    lib.pdb_parse.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64] + [ctypes.POINTER(ctypes.c_float)] * 3 + [
        ctypes.POINTER(ctypes.c_int32)] * 3
    lib.pdb_parse.restype = ctypes.c_int64
    lib.pdb_write_size.argtypes = [ctypes.c_int64] * 3
    lib.pdb_write_size.restype = ctypes.c_int64
    lib.pdb_write.argtypes = (
        [ctypes.POINTER(ctypes.c_float)] * 2
        + [ctypes.POINTER(ctypes.c_int32)] * 3
        + [ctypes.POINTER(ctypes.c_float)]
        + [ctypes.c_int64] * 3 + [ctypes.c_int]
        + [ctypes.c_char_p, ctypes.c_int64])
    lib.pdb_write.restype = ctypes.c_int64

    atom_names = b"\0".join(a.encode() for a in ch.atom_types) + b"\0"
    res3 = [ch.restype_1to3[r] for r in ch.restypes]
    res_names = b"\0".join(r.encode() for r in res3) + b"\0"
    aatypes = (ctypes.c_int32 * len(res3))(*range(len(res3)))
    lib.pdb_set_tables(atom_names, len(ch.atom_types), res_names, aatypes,
                       len(res3), ch.unk_restype_index)
    _lib = lib
    return _lib


def is_available() -> bool:
    return _get_lib() is not None


def parse_pdb_ensemble(text: str, max_models: Optional[int] = None):
    """Parse a (multi-model) PDB into stacked atom37 arrays.

    Returns dict with positions (M, N, 37, 3), mask (M, N, 37),
    b_factors (M, N, 37), aatype/residue_index/chain_index (N,).
    Returns None when the native library is unavailable or the models are
    inconsistent (caller should fall back to the Python parser)."""
    lib = _get_lib()
    if lib is None:
        return None
    raw = text.encode()
    counts = (ctypes.c_int64 * 3)()
    lib.pdb_scan(raw, len(raw), counts)
    n_models, n_res, consistent = counts[0], counts[1], counts[2]
    if n_models == 0 or n_res == 0 or not consistent:
        return None
    if max_models is not None:
        n_models = min(n_models, max_models)

    n_atoms = ch.atom_type_num
    positions = np.zeros((n_models, n_res, n_atoms, 3), np.float32)
    mask = np.zeros((n_models, n_res, n_atoms), np.float32)
    bfac = np.zeros((n_models, n_res, n_atoms), np.float32)
    aatype = np.zeros((n_res,), np.int32)
    res_index = np.zeros((n_res,), np.int32)
    chain_index = np.zeros((n_res,), np.int32)

    filled = lib.pdb_parse(
        raw, len(raw), n_models, n_res, n_atoms,
        positions.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        bfac.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        aatype.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        res_index.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        chain_index.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    if filled <= 0:
        return None
    return {
        "positions": positions[:filled],
        "mask": mask[:filled],
        "b_factors": bfac[:filled],
        "aatype": aatype,
        "residue_index": res_index,
        "chain_index": chain_index,
    }


def write_pdb_ensemble(positions, mask, aatype, residue_index, chain_index,
                       b_factors, force_multi: bool = False) -> Optional[str]:
    """Format an atom37 ensemble as multi-model PDB text natively.

    positions (M, L, 37, 3) f32; mask/b_factors (L, 37) f32;
    aatype/residue_index/chain_index (L,) i32. Returns None when the native
    library is unavailable (caller falls back to the Python writer)."""
    lib = _get_lib()
    if lib is None:
        return None
    positions = np.ascontiguousarray(positions, np.float32)
    mask = np.ascontiguousarray(mask, np.float32)
    b_factors = np.ascontiguousarray(b_factors, np.float32)
    aatype = np.ascontiguousarray(aatype, np.int32)
    residue_index = np.ascontiguousarray(residue_index, np.int32)
    chain_index = np.ascontiguousarray(chain_index, np.int32)
    M, L, A = positions.shape[:3]
    cap = int(lib.pdb_write_size(M, L, int(mask.sum()) // max(L, 1) + 2))
    cap = max(cap, int(M * (mask.sum() + 2 * L + 2) * 96 + 256))
    buf = ctypes.create_string_buffer(cap)
    n = lib.pdb_write(
        positions.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        aatype.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        residue_index.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        chain_index.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        b_factors.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        M, L, A, 1 if force_multi else 0, buf, cap)
    if n <= 0:
        return None
    return buf.raw[:n].decode()
