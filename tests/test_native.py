"""Native C++ PDB parser: equality with the Python parser + speed sanity."""
import time

import numpy as np
import pytest

from str2str_tpu.io import native
from str2str_tpu.io import pdb as pdb_io
from str2str_tpu.io import protein as prot_io


@pytest.fixture(scope="module")
def ensemble_text(fixture_pdb_bpti):
    """Build a 50-model ensemble from BPTI with per-model noise."""
    rng = np.random.RandomState(0)
    prot = prot_io.from_pdb_string(fixture_pdb_bpti.read_text())
    models = []
    for i in range(50):
        noisy = prot_io.Protein(
            atom_positions=(prot.atom_positions
                            + 0.3 * rng.randn(*prot.atom_positions.shape)
                            ).astype(np.float32) * prot.atom_mask[..., None],
            atom_mask=prot.atom_mask, aatype=prot.aatype,
            residue_index=prot.residue_index, chain_index=prot.chain_index,
            b_factors=prot.b_factors)
        models.append(noisy)
    return prot_io.to_pdb(models)


def test_native_available():
    assert native.is_available(), "g++ build of the native parser failed"


def test_native_matches_python(ensemble_text):
    if not native.is_available():
        pytest.skip("no native parser")
    ens = native.parse_pdb_ensemble(ensemble_text)
    assert ens is not None
    models = prot_io.parse_pdb_models(ensemble_text)
    assert ens["positions"].shape[0] == len(models) == 50
    assert ens["positions"].shape[1] == models[0].num_residues
    np.testing.assert_array_equal(ens["aatype"], models[0].aatype)
    np.testing.assert_array_equal(ens["residue_index"], models[0].residue_index)
    for i in (0, 7, 49):
        np.testing.assert_array_equal(ens["mask"][i], models[i].atom_mask)
        np.testing.assert_allclose(ens["positions"][i], models[i].atom_positions,
                                   atol=1e-4)


def test_native_single_model(fixture_pdb):
    if not native.is_available():
        pytest.skip("no native parser")
    text = fixture_pdb.read_text()
    ens = native.parse_pdb_ensemble(text)
    prot = prot_io.from_pdb_string(text)
    assert ens["positions"].shape == (1, prot.num_residues, 37, 3)
    np.testing.assert_allclose(ens["positions"][0], prot.atom_positions, atol=1e-4)
    np.testing.assert_array_equal(ens["aatype"], prot.aatype)


def test_extract_backbone_uses_native(tmp_path, ensemble_text):
    p = tmp_path / "ens.pdb"
    p.write_text(ensemble_text)
    ca = pdb_io.extract_backbone_coords(str(p))
    assert ca.shape[0] == 50
    # Cross-check against the pure-python route.
    models = prot_io.parse_pdb_models(ensemble_text)
    keep = models[0].atom_mask[:, 1] > 0.5
    np.testing.assert_allclose(ca[3], models[3].atom_positions[keep][:, 1], atol=1e-4)


@pytest.mark.slow
def test_native_speedup(ensemble_text):
    if not native.is_available():
        pytest.skip("no native parser")
    t0 = time.perf_counter()
    native.parse_pdb_ensemble(ensemble_text)
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter()
    prot_io.parse_pdb_models(ensemble_text)
    t_python = time.perf_counter() - t0
    assert t_native < t_python, (t_native, t_python)


def test_native_writer_matches_python(tmp_path, fixture_pdb, rng):
    """Native multi-model PDB writer == Python writer (same text modulo
    float-rounding ties; verified by re-parsing both)."""
    from str2str_tpu.io import native
    from str2str_tpu.io import protein as prot_io

    if not native.is_available():
        pytest.skip("no native toolchain")

    prot = prot_io.from_pdb_string(fixture_pdb.read_text())
    M = 4
    pos = np.stack([prot.atom_positions + i * 0.25 for i in range(M)])

    models = [prot_io.Protein(pos[i], prot.atom_mask, prot.aatype,
                              prot.residue_index, prot.chain_index,
                              prot.b_factors) for i in range(M)]
    py_text = prot_io.to_pdb(models)
    nat_text = native.write_pdb_ensemble(
        pos, prot.atom_mask, prot.aatype, prot.residue_index,
        prot.chain_index, prot.b_factors)
    assert nat_text is not None
    # byte-identical framing and fields (printf/format agree on these values)
    assert nat_text == py_text

    # and through atom37_to_pdb the native path round-trips
    from str2str_tpu.io import pdb as pdb_io
    out = tmp_path / "ens.pdb"
    pdb_io.atom37_to_pdb(pos, str(out), aatype=prot.aatype,
                         residue_index=prot.residue_index,
                         chain_index=prot.chain_index,
                         atom_mask=prot.atom_mask,
                         b_factors=prot.b_factors)
    parsed = prot_io.parse_pdb_models(out.read_text())
    assert len(parsed) == M
    np.testing.assert_allclose(
        parsed[3].atom_positions[prot.atom_mask > 0.5],
        pos[3][prot.atom_mask > 0.5], atol=1e-3)
