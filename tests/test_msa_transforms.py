"""Parity tests for the dormant MSA/template transform surface
(str2str_tpu/data/msa_transforms.py vs reference
src/common/data_transforms.py:46-572,1114)."""
import numpy as np
import pytest

import str2str_tpu.data.msa_transforms as M


@pytest.fixture()
def ref():
    from conftest import load_reference_module
    return load_reference_module("src/common/data_transforms.py", "ref_dt_msa")


def _msa_protein(rng, n_seq=7, n_res=12, n_extra=9):
    return {
        "msa": rng.randint(0, 22, (n_seq, n_res)).astype(np.int64),
        "deletion_matrix": rng.randint(0, 5, (n_seq, n_res)).astype(np.float32),
        "extra_msa": rng.randint(0, 22, (n_extra, n_res)).astype(np.int64),
        "extra_deletion_matrix": rng.randint(0, 5, (n_extra, n_res)).astype(np.float32),
        "aatype": rng.randint(0, 20, (n_res,)).astype(np.int64),
        "between_segment_residues": np.zeros((n_res,), np.int32),
    }


def _t(x):
    import torch
    return torch.tensor(np.asarray(x))


def test_hhblits_map_matches_reference():
    from conftest import load_reference_module
    rc = load_reference_module("src/common/residue_constants.py", "ref_rc_msa")
    assert tuple(M.MAP_HHBLITS_AATYPE_TO_OUR_AATYPE) == tuple(
        rc.MAP_HHBLITS_AATYPE_TO_OUR_AATYPE)


def test_one_hot_and_masks_match_reference(rng, ref):
    x = rng.randint(0, 22, (5, 8)).astype(np.int64)
    np.testing.assert_array_equal(
        M.make_one_hot(x, 23), ref.make_one_hot(_t(x), 23).numpy())

    p = {"aatype": x[0]}
    q = {"aatype": _t(x[0])}
    np.testing.assert_array_equal(
        M.make_seq_mask(p)["seq_mask"], ref.make_seq_mask(q)["seq_mask"].numpy())

    ta = rng.randint(0, 2, (3, 8, 22)).astype(np.float32)
    p = {"template_aatype": ta}
    q = {"template_aatype": _t(ta)}
    np.testing.assert_array_equal(
        M.make_template_mask(p)["template_mask"],
        ref.make_template_mask(q)["template_mask"].numpy())


def test_fix_templates_and_correct_msa_match_reference(rng, ref):
    import torch
    n_t, n_res = 3, 8
    idx = rng.randint(0, 22, (n_t, n_res))
    onehot = np.eye(22, dtype=np.float32)[idx]
    got = M.fix_templates_aatype({"template_aatype": onehot.copy()})
    want = ref.fix_templates_aatype(
        {"template_aatype": torch.tensor(onehot)})
    np.testing.assert_array_equal(got["template_aatype"],
                                  want["template_aatype"].numpy())

    msa = rng.randint(0, 22, (5, n_res)).astype(np.int64)
    got = M.correct_msa_restypes({"msa": msa.copy()})
    want = ref.correct_msa_restypes({"msa": _t(msa)})
    np.testing.assert_array_equal(got["msa"], want["msa"].numpy())


def test_squeeze_features_matches_reference(rng, ref):
    aa_oh = np.eye(21, dtype=np.float32)[rng.randint(0, 20, (6,))]
    p = {"aatype": aa_oh.copy(),
         "seq_length": np.asarray([6, 6, 6, 6, 6, 6], np.int64),
         "resolution": np.asarray([[2.0]], np.float32)[0],
         "num_alignments": np.asarray([4, 4, 4, 4, 4, 4], np.int64)}
    q = {"aatype": _t(aa_oh), "seq_length": _t(p["seq_length"]),
         "resolution": _t(p["resolution"]),
         "num_alignments": _t(p["num_alignments"])}
    got = M.squeeze_features(p)
    want = ref.squeeze_features(q)
    np.testing.assert_array_equal(got["aatype"], want["aatype"].numpy())
    assert int(got["seq_length"]) == int(want["seq_length"])
    assert int(got["num_alignments"]) == int(want["num_alignments"])


def test_cluster_pipeline_matches_reference(rng, ref):
    """make_msa_mask -> nearest_neighbor_clusters -> summarize_clusters ->
    make_hhblits_profile -> make_msa_feat, all on the same data."""
    p = _msa_protein(rng)
    q = {k: _t(v) for k, v in p.items()}

    p = M.make_msa_mask(p)
    q = ref.make_msa_mask(q)
    p["extra_msa_mask"] = np.ones_like(p["extra_msa"], np.float32)
    q["extra_msa_mask"] = _t(p["extra_msa_mask"])

    p = M.nearest_neighbor_clusters(p)
    q = ref.nearest_neighbor_clusters()(q)
    np.testing.assert_array_equal(p["extra_cluster_assignment"],
                                  q["extra_cluster_assignment"].numpy())

    p = M.summarize_clusters(p)
    q = ref.summarize_clusters()(q)
    np.testing.assert_allclose(p["cluster_profile"],
                               q["cluster_profile"].numpy(), atol=1e-6)
    np.testing.assert_allclose(p["cluster_deletion_mean"],
                               q["cluster_deletion_mean"].numpy(), atol=1e-6)

    p = M.make_hhblits_profile(p)
    q = ref.make_hhblits_profile(q)
    np.testing.assert_allclose(p["hhblits_profile"],
                               q["hhblits_profile"].numpy(), atol=1e-6)

    p = M.make_msa_feat(p)
    q = ref.make_msa_feat()(q)
    np.testing.assert_allclose(p["msa_feat"], q["msa_feat"].numpy(), atol=1e-6)
    np.testing.assert_allclose(p["target_feat"], q["target_feat"].numpy(),
                               atol=1e-6)
    np.testing.assert_allclose(p["extra_has_deletion"],
                               q["extra_has_deletion"].numpy(), atol=1e-6)
    np.testing.assert_allclose(p["extra_deletion_value"],
                               q["extra_deletion_value"].numpy(), atol=1e-6)


def test_unsorted_segment_sum_matches_reference(rng, ref):
    data = rng.randn(10, 4).astype(np.float32)
    seg = rng.randint(0, 5, (10,)).astype(np.int64)
    np.testing.assert_allclose(
        M.unsorted_segment_sum(data, seg, 5),
        ref.unsorted_segment_sum(_t(data), _t(seg), 5).numpy(), atol=1e-6)


def test_sample_msa_semantics(rng):
    """Query row always first; selected+extra partition the row set."""
    p = _msa_protein(rng)
    del p["extra_msa"], p["extra_deletion_matrix"]
    p = M.make_msa_mask(p)
    orig = p["msa"].copy()
    g = np.random.default_rng(3)
    out = M.sample_msa(dict(p), max_seq=4, keep_extra=True, rng=g)
    assert out["msa"].shape[0] == 4
    assert out["extra_msa"].shape[0] == orig.shape[0] - 4
    np.testing.assert_array_equal(out["msa"][0], orig[0])  # query kept
    # partition: every original row appears exactly once across sel+extra
    rows = np.concatenate([out["msa"], out["extra_msa"]])
    assert sorted(map(tuple, rows)) == sorted(map(tuple, orig))
    # fewer rows than max_seq: select-all
    out2 = M.sample_msa(dict(p), max_seq=100, keep_extra=True,
                        rng=np.random.default_rng(4))
    assert out2["msa"].shape[0] == orig.shape[0]
    assert out2["extra_msa"].shape[0] == 0


def test_masked_msa_semantics(rng):
    p = _msa_protein(rng, n_seq=20, n_res=30)
    p = M.make_hhblits_profile(p)
    orig = p["msa"].copy()
    out = M.make_masked_msa(dict(p), uniform_prob=0.1, profile_prob=0.1,
                            same_prob=0.1, replace_fraction=0.5,
                            rng=np.random.default_rng(0))
    np.testing.assert_array_equal(out["true_msa"], orig)
    changed = out["msa"] != orig
    # changes only where bert_mask says so
    assert not np.any(changed & (out["bert_mask"] == 0))
    # replace_fraction=0.5 over 600 entries: mask rate in a loose band
    rate = out["bert_mask"].mean()
    assert 0.35 < rate < 0.65
    # the [MASK] class (22) appears among replacements (mask_prob = 0.7)
    assert np.any(out["msa"][out["bert_mask"] > 0] == 22)
    assert out["msa"].max() <= 22


def test_block_delete_and_crop_extra(rng):
    p = _msa_protein(rng, n_seq=20)
    orig = p["msa"].copy()
    out = M.block_delete_msa(dict(p), msa_fraction_per_block=0.2,
                             num_blocks=2, randomize_num_blocks=False,
                             rng=np.random.default_rng(1))
    np.testing.assert_array_equal(out["msa"][0], orig[0])  # query kept
    assert out["msa"].shape[0] < orig.shape[0]
    # survivors are original rows in original order
    kept = [tuple(r) for r in out["msa"]]
    pool = [tuple(r) for r in orig]
    assert all(r in pool for r in kept)

    out2 = M.crop_extra_msa(dict(p), max_extra_msa=3,
                            rng=np.random.default_rng(2))
    assert out2["extra_msa"].shape[0] == 3


def test_make_fixed_size_matches_reference(rng, ref):
    p = _msa_protein(rng, n_seq=5, n_res=8, n_extra=6)
    schema = {"msa": [M.NUM_MSA_SEQ, M.NUM_RES],
              "extra_msa": [M.NUM_EXTRA_SEQ, M.NUM_RES],
              "aatype": [M.NUM_RES]}
    sel = {k: p[k] for k in schema}
    got = M.make_fixed_size(dict(sel), schema, msa_cluster_size=9,
                            extra_msa_size=11, num_res=16)
    ref_schema = {"msa": [ref.NUM_MSA_SEQ, ref.NUM_RES],
                  "extra_msa": [ref.NUM_EXTRA_SEQ, ref.NUM_RES],
                  "aatype": [ref.NUM_RES]}
    want = ref.make_fixed_size(ref_schema, 9, 11, 16, 0)(
        {k: _t(v) for k, v in sel.items()})
    for k in schema:
        np.testing.assert_array_equal(got[k], want[k].numpy())


def test_random_crop_to_size_semantics(rng):
    n_res = 30
    p = {"seq_length": np.asarray(n_res, np.int64),
         "aatype": rng.randint(0, 20, (n_res,)).astype(np.int64),
         "all_atom_positions": rng.randn(n_res, 37, 3).astype(np.float32)}
    schema = {"aatype": [M.NUM_RES],
              "all_atom_positions": [M.NUM_RES, None, None]}
    starts = set()
    for seed in range(30):
        out = M.random_crop_to_size(
            {k: (v.copy() if isinstance(v, np.ndarray) else v)
             for k, v in p.items()},
            crop_size=10, max_templates=0, shape_schema=schema,
            rng=np.random.default_rng(seed))
        assert int(out["seq_length"]) == 10
        assert out["aatype"].shape == (10,)
        assert out["all_atom_positions"].shape == (10, 37, 3)
        # contiguous window of the original
        i = next(j for j in range(n_res - 9)
                 if np.array_equal(p["aatype"][j:j + 10], out["aatype"]))
        starts.add(i)
        np.testing.assert_array_equal(
            out["all_atom_positions"], p["all_atom_positions"][i:i + 10])
    assert len(starts) > 5  # crops genuinely random
    # shorter than crop size: unchanged
    out = M.random_crop_to_size(
        {k: (v.copy() if isinstance(v, np.ndarray) else v)
         for k, v in p.items()},
        crop_size=64, max_templates=0, shape_schema=schema,
        rng=np.random.default_rng(0))
    assert int(out["seq_length"]) == n_res
    np.testing.assert_array_equal(out["aatype"], p["aatype"])


def test_misc_small_transforms(rng):
    p = _msa_protein(rng)
    p2 = M.make_all_atom_aatype(dict(p))
    np.testing.assert_array_equal(p2["all_atom_aatype"], p["aatype"])

    p3 = M.cast_to_64bit_ints({"x": np.ones((2,), np.int32)})
    assert p3["x"].dtype == np.int64

    p4 = M.add_distillation_flag(dict(p), 1)
    out = M.sample_msa_distillation(p4, max_seq=3,
                                    rng=np.random.default_rng(0))
    assert out["msa"].shape[0] == 3

    p5 = M.randomly_replace_msa_with_unknown(
        _msa_protein(rng, n_seq=30, n_res=30), 0.3,
        np.random.default_rng(0))
    frac = (p5["msa"] == M.X_IDX).mean()
    assert 0.1 < frac < 0.6  # ~0.3 plus pre-existing X entries

    p6 = {"template_a": np.zeros((5, 3)), "other": np.ones(2)}
    out = M.crop_templates(p6, 2)
    assert out["template_a"].shape[0] == 2 and out["other"].shape == (2,)

    sel = M.select_feat({"a": 1, "b": 2}, ["a"])
    assert sel == {"a": 1}

    d = M.delete_extra_msa(M.sample_msa(_msa_protein(rng), 3, True,
                                        np.random.default_rng(0)))
    assert not any(k.startswith("extra_msa") for k in d
                   if k in ("extra_msa",))
