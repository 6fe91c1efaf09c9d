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


SEQRES_CIF = """data_2xyz
#
_entry.id 2XYZ
_refine.ls_d_res_high 2.00
#
loop_
_struct_asym.id
_struct_asym.entity_id
A 1
#
loop_
_entity_poly_seq.entity_id
_entity_poly_seq.num
_entity_poly_seq.mon_id
1 1 ALA
1 2 GLY
1 3 SER
1 4 THR
1 5 VAL
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
ATOM 1 CA . ALA A 1 0.0 0.0 0.0 10.0 1 A 1
ATOM 2 CA . SER A 3 7.6 0.0 0.0 10.0 3 A 1
ATOM 3 CA . VAL A 5 15.2 0.0 0.0 10.0 5 A 1
#
"""


def test_seqres_atom_mapping(tmp_path):
    """With _entity_poly_seq present, chains span the FULL polymer sequence
    and unresolved residues are zero-masked (reference seqres_to_structure,
    mmcif_parsing.py:165)."""
    p = tmp_path / "2xyz.cif"
    p.write_text(SEQRES_CIF)
    obj = mmcif.parse_mmcif(p)
    a = obj.chains["A"]
    assert a.num_residues == 5
    assert a.sequence() == "AGSTV"
    # resolved: 1, 3, 5 -> CA masks set; 2, 4 unresolved -> fully masked out
    ca = 1
    np.testing.assert_array_equal(a.atom_mask[:, ca], [1, 0, 1, 0, 1])
    assert a.atom_mask[1].sum() == 0 and a.atom_mask[3].sum() == 0
    np.testing.assert_allclose(a.atom_positions[2, ca], [7.6, 0, 0], atol=1e-5)
    np.testing.assert_array_equal(a.residue_index, [1, 2, 3, 4, 5])


def _ideal_helix_atom37(L=20):
    """Ideal alpha-helix backbone (rise 1.5 A, 100 deg/residue, r=2.3) with
    approximate N/C/O placement from consecutive CA geometry."""
    from str2str_tpu.geometry import chemical as ch
    t = np.arange(L) * np.deg2rad(100.0)
    ca = np.stack([2.3 * np.cos(t), 2.3 * np.sin(t), 1.5 * np.arange(L)], -1)
    pos = np.zeros((L, 37, 3), np.float32)
    mask = np.zeros((L, 37), np.float32)
    # Build N, C, O by interpolating along the chain; good enough for the
    # H-bond energy to pick up the i -> i+4 pattern.
    for i in range(L):
        nxt = ca[min(i + 1, L - 1)]
        prv = ca[max(i - 1, 0)]
        d_next = (nxt - ca[i])
        d_prev = (ca[i] - prv)
        pos[i, ch.atom_order["CA"]] = ca[i]
        pos[i, ch.atom_order["N"]] = ca[i] - 0.40 * d_prev + [0.4, 0.4, -0.4]
        pos[i, ch.atom_order["C"]] = ca[i] + 0.40 * d_next
        # carbonyl O points roughly along the helix axis (toward N of i+4)
        pos[i, ch.atom_order["O"]] = pos[i, ch.atom_order["C"]] + [0, 0, 1.23]
        mask[i, [ch.atom_order[a] for a in ("N", "CA", "C", "O")]] = 1.0
    return pos, mask


def test_secondary_structure_helix_and_rg():
    from str2str_tpu.data import secondary as S

    pos, mask = _ideal_helix_atom37(20)
    ss = S.assign_secondary_structure(pos, mask)
    frac = S.secondary_structure_percents(pos, mask)
    assert frac["helix_percent"] > 0.5, (ss, frac)
    assert frac["strand_percent"] < 0.2

    rg = S.radius_of_gyration(pos, mask)
    assert np.isfinite(rg) and 0.2 < rg < 3.0  # nanometers

    # An extended straight chain has no H-bonds at all -> all coil.
    L = 12
    pos2 = np.zeros((L, 37, 3), np.float32)
    mask2 = np.zeros((L, 37), np.float32)
    from str2str_tpu.geometry import chemical as ch
    for i in range(L):
        base = np.asarray([3.8 * i, 0, 0])
        pos2[i, ch.atom_order["N"]] = base + [-1.2, 0.3, 0]
        pos2[i, ch.atom_order["CA"]] = base
        pos2[i, ch.atom_order["C"]] = base + [1.2, 0.3, 0]
        pos2[i, ch.atom_order["O"]] = base + [1.4, 1.5, 0]
        mask2[i, [ch.atom_order[a] for a in ("N", "CA", "C", "O")]] = 1.0
    frac2 = S.secondary_structure_percents(pos2, mask2)
    assert frac2["coil_percent"] > 0.8


def test_preprocess_metadata_has_ss_columns(tmp_path, fixture_pdb):
    from str2str_tpu.data.preprocess import process_file

    rows = process_file(str(fixture_pdb), str(tmp_path), min_len=5)
    assert rows, "no chains processed"
    row = rows[0]
    for col in ("helix_percent", "strand_percent", "coil_percent",
                "radius_gyration"):
        assert col in row and np.isfinite(row[col]), col
    assert abs(row["helix_percent"] + row["strand_percent"]
               + row["coil_percent"] - 1.0) < 1e-6
