#!/usr/bin/env python
"""Extract published protein chemical constants into a JSON data file.

The tables (residue types, atom vocabularies, chi-angle definitions, idealized
rigid-group atom coordinates, van-der-Waals radii, ideal backbone geometry)
originate from the AlphaFold 2 supplementary material / the PDB chemical
component dictionary. They are physical/chemical *data*, not code. This script
reads them from any available source module exposing the standard AF2-style
names (here: the reference checkout's `residue_constants`) and serializes the
raw tables to `str2str_tpu/geometry/data/chemical.json`.

All *derived* arrays (default frames, atom14/atom37 lookup tables, ...) are
recomputed from this raw data by `str2str_tpu.geometry.chemical` with fresh
code.

Usage: python scripts/extract_chemical_constants.py [source_dir]
"""
import importlib.util
import json
import sys
from pathlib import Path

OUT = Path(__file__).resolve().parents[1] / "str2str_tpu/geometry/data/chemical.json"


def load_source_module(source_dir: str):
    path = Path(source_dir) / "src/common/residue_constants.py"
    spec = importlib.util.spec_from_file_location("rc_src", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main():
    source = sys.argv[1] if len(sys.argv) > 1 else "/root/reference"
    rc = load_source_module(source)

    data = {
        # 20 canonical residues, one-letter codes, in the canonical AF2 order.
        "restypes": rc.restypes,
        "restype_1to3": rc.restype_1to3,
        # 37-atom heavy-atom vocabulary.
        "atom_types": rc.atom_types,
        # Compact per-residue 14-atom naming.
        "restype_name_to_atom14_names": rc.restype_name_to_atom14_names,
        # Heavy atoms per residue (atom37 subsets).
        "residue_atoms": rc.residue_atoms,
        # Chi angle definitions: 4 atoms per chi, per residue name.
        "chi_angles_atoms": rc.chi_angles_atoms,
        # Which of the 4 chi angles exist per residue (canonical order).
        "chi_angles_mask": rc.chi_angles_mask,
        # Which chi angles are pi-periodic (180 deg symmetric).
        "chi_pi_periodic": rc.chi_pi_periodic,
        # (atom_name, rigid_group_index, xyz in group frame) per residue.
        "rigid_group_atom_positions": rc.rigid_group_atom_positions,
        # Atom-renaming ambiguities (e.g. ASP OD1<->OD2).
        "residue_atom_renaming_swaps": rc.residue_atom_renaming_swaps,
        # Van der Waals radii by element.
        "van_der_waals_radius": rc.van_der_waals_radius,
        # Ideal backbone inter-residue geometry [value, stddev].
        "between_res_bond_length_c_n": rc.between_res_bond_length_c_n,
        "between_res_bond_length_stddev_c_n": rc.between_res_bond_length_stddev_c_n,
        "between_res_cos_angles_c_n_ca": rc.between_res_cos_angles_c_n_ca,
        "between_res_cos_angles_ca_c_n": rc.between_res_cos_angles_ca_c_n,
        "ca_ca": rc.ca_ca,
    }
    OUT.parent.mkdir(parents=True, exist_ok=True)
    OUT.write_text(json.dumps(data, indent=1))
    print(f"wrote {OUT} ({OUT.stat().st_size} bytes)")


if __name__ == "__main__":
    main()
