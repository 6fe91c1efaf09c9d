import pickle

import numpy as np

from str2str_tpu.io import mmcif

MINIMAL_CIF = """data_1abc
#
_entry.id 1ABC
_exptl.method 'X-RAY DIFFRACTION'
_refine.ls_d_res_high 1.80
#
loop_
_atom_site.group_PDB
_atom_site.id
_atom_site.label_atom_id
_atom_site.label_alt_id
_atom_site.label_comp_id
_atom_site.label_asym_id
_atom_site.label_seq_id
_atom_site.Cartn_x
_atom_site.Cartn_y
_atom_site.Cartn_z
_atom_site.B_iso_or_equiv
_atom_site.auth_seq_id
_atom_site.auth_asym_id
_atom_site.pdbx_PDB_model_num
ATOM 1 N . ALA A 1 0.000 0.000 0.000 10.0 1 A 1
ATOM 2 CA . ALA A 1 1.458 0.000 0.000 10.0 1 A 1
ATOM 3 C . ALA A 1 2.004 1.420 0.000 10.0 1 A 1
ATOM 4 O . ALA A 1 1.251 2.390 0.000 10.0 1 A 1
ATOM 5 CB . ALA A 1 1.988 -0.773 -1.199 10.0 1 A 1
ATOM 6 N . GLY A 2 3.332 1.536 0.000 10.0 2 A 1
ATOM 7 CA . GLY A 2 3.988 2.839 0.000 10.0 2 A 1
ATOM 8 C . GLY A 2 5.504 2.693 0.000 10.0 2 A 1
ATOM 9 O . GLY A 2 6.030 1.580 0.000 10.0 2 A 1
HETATM 10 SE . MSE A 3 7.000 3.000 0.000 10.0 3 A 1
ATOM 11 CA . MSE A 3 6.300 3.900 0.000 10.0 3 A 1
ATOM 12 N . SER B 1 0.000 5.000 0.000 12.0 1 B 1
ATOM 13 CA . SER B 1 1.458 5.000 0.000 12.0 1 B 1
ATOM 14 CA . SER B 1 9.999 9.999 9.999 12.0 1 B 2
#
"""


def test_parse_minimal_mmcif(tmp_path):
    p = tmp_path / "1abc.cif"
    p.write_text(MINIMAL_CIF)
    obj = mmcif.parse_mmcif(p)
    assert obj.header.entry_id == "1abc"
    assert obj.header.resolution == 1.8
    assert obj.header.method == "X-RAY DIFFRACTION"
    assert set(obj.chains) == {"A", "B"}

    a = obj.chains["A"]
    assert a.num_residues == 3
    assert a.sequence() == "AGM"  # MSE -> MET
    np.testing.assert_allclose(a.atom_positions[0, 1], [1.458, 0, 0], atol=1e-4)
    # MSE SE mapped to SD
    from str2str_tpu.geometry import chemical as ch
    assert a.atom_mask[2, ch.atom_order["SD"]] == 1.0
    # Second model ignored.
    b = obj.chains["B"]
    assert b.num_residues == 1
    np.testing.assert_allclose(b.atom_positions[0, 1], [1.458, 5, 0], atol=1e-4)


def test_preprocess_pipeline(tmp_path):
    from str2str_tpu.data.preprocess import main as preprocess_main

    src = tmp_path / "raw"
    src.mkdir()
    (src / "1abc.cif").write_text(MINIMAL_CIF)
    out = tmp_path / "processed"
    preprocess_main([
        "--input-dir", str(src), "--output-dir", str(out),
        "--min-len", "1", "--num-workers", "1",
    ])
    import pandas as pd
    df = pd.read_csv(out / "metadata.csv")
    assert len(df) == 2  # chains A and B
    row = df[df.accession_code == "1abc_A"].iloc[0]
    assert row.seq_len == 3
    assert row.resolution == 1.8
    with open(row.processed_path, "rb") as f:
        d = pickle.load(f)
    assert d["aatype"].shape == (3,)

    # Pickles round-trip through the training dataset.
    from str2str_tpu.data.dataset import ProteinDataset
    from str2str_tpu.data.featurize import FeaturizeConfig
    ds = ProteinDataset(str(out), suffix="pkl",
                        transform=FeaturizeConfig(strip_missing_residues=False))
    feats = ds[0]
    assert "rigidgroups_gt_frames" in feats
