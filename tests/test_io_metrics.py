import numpy as np
import pytest

from str2str_tpu.evaluation import metrics as M
from str2str_tpu.evaluation.tica import fit_tica
from str2str_tpu.io import pdb as pdb_io
from str2str_tpu.io import protein as prot_io


def test_pdb_parse_fixture(fixture_pdb):
    prot = prot_io.from_pdb_string(fixture_pdb.read_text())
    assert prot.num_residues == 10  # chignolin
    assert prot.sequence() == "YYDPETGTWY"
    # CA atoms present everywhere
    assert np.all(prot.atom_mask[:, 1] == 1.0)


def test_pdb_roundtrip(fixture_pdb):
    prot = prot_io.from_pdb_string(fixture_pdb.read_text())
    text = prot_io.to_pdb(prot)
    prot2 = prot_io.from_pdb_string(text)
    np.testing.assert_array_equal(prot.aatype, prot2.aatype)
    np.testing.assert_allclose(prot.atom_positions, prot2.atom_positions, atol=1e-3)
    np.testing.assert_array_equal(prot.atom_mask, prot2.atom_mask)
    np.testing.assert_array_equal(prot.residue_index, prot2.residue_index)


def test_multimodel_roundtrip(tmp_path, fixture_pdb, rng):
    prot = prot_io.from_pdb_string(fixture_pdb.read_text())
    ens = np.stack([prot.atom_positions + rng.randn(1, 1, 3).astype(np.float32)
                    for _ in range(5)])
    path = tmp_path / "ens.pdb"
    pdb_io.atom37_to_pdb(ens, str(path), aatype=prot.aatype,
                         residue_index=prot.residue_index,
                         chain_index=prot.chain_index,
                         atom_mask=prot.atom_mask)
    models = prot_io.parse_pdb_models(path.read_text())
    assert len(models) == 5
    np.testing.assert_allclose(models[2].atom_positions[models[2].atom_mask > 0.5],
                               ens[2][prot.atom_mask > 0.5], atol=1e-3)
    # merge
    merged = tmp_path / "merged.pdb"
    pdb_io.merge_pdbfiles([str(path), str(path)], str(merged))
    assert len(prot_io.parse_pdb_models(merged.read_text())) == 10
    # CA extraction
    ca = pdb_io.extract_backbone_coords(str(path))
    assert ca.shape == (5, 10, 3)


def _fake_ensembles(rng, B=100, L=20):
    base = rng.randn(L, 3).astype(np.float64) * 3
    target = base[None] + 0.5 * rng.randn(B, L, 3)
    sample = base[None] + 0.6 * rng.randn(B, L, 3)
    return {"target": target, "sample": sample}


def test_metrics_self_consistency(rng):
    ens = _fake_ensembles(rng)
    out = M.evaluate_ensembles(ens)
    assert out["js_pwd"]["target"] == 0.0
    assert 0.0 <= out["js_pwd"]["sample"] <= 1.0
    assert 0.0 <= out["js_tica"]["sample"] <= 1.0
    assert 0.0 <= out["val_clash"]["sample"] <= 1.0
    # identical ensembles -> tiny JS
    same = {"target": ens["target"], "sample": ens["target"].copy()}
    out2 = M.js_pwd(same)
    assert out2["sample"] < 1e-6


def test_tica_decorrelates(rng):
    # A linear Markov chain with known slow direction.
    T, D = 2000, 6
    slow = np.zeros(T)
    for t in range(1, T):
        slow[t] = 0.99 * slow[t - 1] + 0.1 * rng.randn()
    fast = rng.randn(T, D - 1)
    mix = rng.randn(D, D)
    data = np.concatenate([slow[:, None], fast], axis=1) @ mix
    model = fit_tica(data, lagtime=20, dim=2)
    y = model.transform(data)
    # First TIC should recover the slow coordinate (up to sign/scale).
    corr = np.corrcoef(y[:, 0], slow)[0, 1]
    assert abs(corr) > 0.95
    assert model.eigenvalues[0] > model.eigenvalues[1]


@pytest.mark.parity
def test_metrics_parity_with_reference(rng, reference_available):
    if not reference_available:
        pytest.skip("no reference checkout")
    from tests.conftest import load_reference_module
    ref_m = load_reference_module("src/metrics/metrics.py", "ref_metrics")

    ens = _fake_ensembles(rng)
    assert M.validity(ens) == ref_m.validity(ens)
    assert M.bonding_validity(ens) == ref_m.bonding_validity(ens)
    mine = M.js_pwd(ens)
    theirs = ref_m.js_pwd(ens)
    for k in mine:
        assert abs(mine[k] - theirs[k]) < 2e-4, (k, mine[k], theirs[k])
    mine_rg = M.js_rg(ens)
    theirs_rg = ref_m.js_rg(ens)
    for k in mine_rg:
        assert abs(mine_rg[k] - theirs_rg[k]) < 2e-4


def test_tica_against_independent_generalized_eig(rng):
    """Cross-validate evaluation/tica.py against an independent oracle:
    the same reversible-TICA math (symmetrized covariances, Bessel
    correction) solved as a direct generalized eigenproblem
    C0t v = lambda C00 v with scipy — a different numerical route than the
    whitening path the implementation uses. deeptime itself is not in the
    image (conftest stubs it), so two independent implementations agreeing
    + the committed regression goldens below stand in for library parity."""
    import scipy.linalg
    from str2str_tpu.evaluation.tica import fit_tica

    # Metastable two-state toy trajectory with slow switching.
    T, D, lag = 600, 6, 20
    state = (np.cumsum(rng.rand(T) < 0.01) % 2).astype(float)
    centers = rng.randn(2, D) * 3
    x = centers[state.astype(int)] + 0.3 * rng.randn(T, D)

    model = fit_tica(x, lagtime=lag, dim=2)

    # independent oracle
    x0, xt = x[:-lag], x[lag:]
    mean = 0.5 * (x0.mean(0) + xt.mean(0))
    a, b = x0 - mean, xt - mean
    n = len(a)
    c00 = 0.5 * (a.T @ a + b.T @ b) / (n - 1)
    c0t = 0.5 * (a.T @ b + b.T @ a) / (n - 1)
    lam, vecs = scipy.linalg.eigh(c0t, c00)
    order = np.argsort(lam)[::-1]
    lam, vecs = lam[order][:2], vecs[:, order][:, :2]

    np.testing.assert_allclose(model.eigenvalues, lam, atol=1e-8)
    # projections match up to per-component sign (kinetic_map scales by
    # eigenvalues, so compare the scaled oracle)
    got = model.transform(x)
    want = (x - mean) @ (vecs * lam[None, :])
    for d in range(2):
        err_same = np.abs(got[:, d] - want[:, d]).max()
        err_flip = np.abs(got[:, d] + want[:, d]).max()
        assert min(err_same, err_flip) < 1e-7


def test_tica_regression_goldens():
    """Deterministic goldens: protects the TICA numerics (and hence js_tica)
    against silent regressions."""
    from str2str_tpu.evaluation.tica import fit_tica

    rng = np.random.RandomState(1234)
    T, D = 300, 4
    drift = np.sin(np.arange(T)[:, None] * 0.05) * np.asarray([3, -1, 2, 0.5])
    x = drift + 0.2 * rng.randn(T, D)
    model = fit_tica(x, lagtime=10, dim=2)
    np.testing.assert_allclose(
        model.eigenvalues, [0.88172583, 0.05964413], atol=1e-6)
    got = model.transform(x[:3])
    np.testing.assert_allclose(np.abs(got), np.abs(np.asarray(
        [[0.03594144, 0.07993717],
         [0.0807883, 0.038529],
         [-0.0701778, 0.08437752]])), atol=1e-5)


def test_extract_backbone_rejects_inconsistent_models(tmp_path, fixture_pdb):
    """Python fallback must match the native parser's contract: refuse
    multi-model files whose models carry different residues (previously it
    silently mis-selected coordinates with the model-0 mask)."""
    from str2str_tpu.io import pdb as pdb_io
    from str2str_tpu.io import protein as prot_io

    prot = prot_io.from_pdb_string(fixture_pdb.read_text())
    # model 2 drops the first residue -> inconsistent
    import dataclasses
    short = dataclasses.replace(
        prot,
        atom_positions=prot.atom_positions[1:],
        atom_mask=prot.atom_mask[1:], aatype=prot.aatype[1:],
        residue_index=prot.residue_index[1:],
        chain_index=prot.chain_index[1:], b_factors=prot.b_factors[1:])
    bad = tmp_path / "bad.pdb"
    bad.write_text(prot_io.to_pdb([prot, short]))

    from unittest import mock
    from str2str_tpu.io import native
    with mock.patch.object(native, "is_available", lambda: False):
        with pytest.raises(ValueError, match="inconsistent"):
            pdb_io.extract_backbone_coords(str(bad))
