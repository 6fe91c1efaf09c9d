#!/usr/bin/env python
"""Reference MD trajectory generation / ensemble enhancement with OpenMM.

Capability parity with the reference `scripts/simulate.py:34-513`: per-target
DESRES-protocol temperatures, pdbfixer cleanup, minimize -> NVT equilibration
-> NPT equilibration -> NPT production, plus an "enhanced sampling" mode that
runs short MD from every conformation of a sampled ensemble and merges the
results. OpenMM/pdbfixer are external dependencies (same for the reference)
and are not shipped in this image; without them the script exits with install
instructions.

Usage:
    python scripts/simulate_md.py --pdb target.pdb --output-dir md/ \
        [--production-ns 100] [--temperature 300]
    python scripts/simulate_md.py --enhance ensemble.pdb --output-dir md/ \
        [--per-conformer-ps 100]
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

# DESRES fast-folding protocol temperatures (K) per target
# (Lindorff-Larsen et al., Science 2011; mirrored from the reference's
# per-target tables, simulate.py:34-61).
DESRES_TEMPERATURES = {
    "CLN025": 340.0, "2JOF": 290.0, "1FME": 325.0, "2F4K": 360.0,
    "GTT": 360.0, "NTL9": 355.0, "2WAV": 298.0, "PRB": 340.0,
    "UVF": 360.0, "NuG2": 350.0, "A3D": 370.0, "lambda": 350.0,
    "bpti": 300.0,
}

# Published aggregate simulation times (microseconds) per target from the
# same paper (reference simulate.py:35-48) — the trajectory lengths behind
# the JS-metric reference ensembles. Used to report coverage and for
# --desres-fraction scaling of the production run.
DESRES_SIMULATION_TIME_US = {
    "CLN025": 106, "2JOF": 208, "1FME": 325, "2F4K": 125,
    "GTT": 1137, "NTL9": 2936, "2WAV": 429, "PRB": 104,
    "UVF": 327, "NuG2": 1155, "A3D": 707, "lambda": 643,
}


def require_openmm():
    try:
        import openmm  # noqa: F401
        import pdbfixer  # noqa: F401
    except ImportError:
        sys.exit(
            "OpenMM/pdbfixer are not installed in this environment.\n"
            "Install with:  conda install -c conda-forge openmm pdbfixer\n"
            "(The reference has the same external dependency; see its "
            "scripts/simulate.py.)")


def run_md(pdb_path: str, out_dir: str, temperature: float,
           production_ns: float, equil_ns: float = 1.0,
           implicit_solvent: bool = False, report_ps: float = 100.0):
    require_openmm()
    import openmm
    from openmm import app, unit
    from pdbfixer import PDBFixer

    fixer = PDBFixer(filename=pdb_path)
    fixer.findMissingResidues()
    fixer.findNonstandardResidues()
    fixer.replaceNonstandardResidues()
    fixer.removeHeterogens(True)
    fixer.findMissingAtoms()
    fixer.addMissingAtoms()
    fixer.addMissingHydrogens(7.0)

    if implicit_solvent:
        ff = app.ForceField("amber99sb.xml", "implicit/gbn2.xml")
        modeller = app.Modeller(fixer.topology, fixer.positions)
    else:
        ff = app.ForceField("amber99sb.xml", "tip3p.xml")
        modeller = app.Modeller(fixer.topology, fixer.positions)
        modeller.addSolvent(ff, padding=1.0 * unit.nanometer)

    system = ff.createSystem(
        modeller.topology, nonbondedMethod=app.PME if not implicit_solvent
        else app.NoCutoff, nonbondedCutoff=1.0 * unit.nanometer,
        constraints=app.HBonds)
    integrator = openmm.LangevinMiddleIntegrator(
        temperature * unit.kelvin, 1.0 / unit.picosecond,
        0.002 * unit.picoseconds)
    sim = app.Simulation(modeller.topology, system, integrator)
    sim.context.setPositions(modeller.positions)

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    stem = Path(pdb_path).stem

    print("minimizing ...")
    sim.minimizeEnergy()
    steps_per_ns = 500_000
    print(f"NVT equilibration {equil_ns} ns ...")
    sim.step(int(equil_ns * steps_per_ns))
    if not implicit_solvent:
        system.addForce(openmm.MonteCarloBarostat(
            1.0 * unit.bar, temperature * unit.kelvin))
        sim.context.reinitialize(preserveState=True)
        print(f"NPT equilibration {equil_ns} ns ...")
        sim.step(int(equil_ns * steps_per_ns))

    report_steps = int(report_ps * 500)
    sim.reporters.append(app.PDBReporter(
        str(out / f"{stem}_traj.pdb"), report_steps))
    sim.reporters.append(app.StateDataReporter(
        str(out / f"{stem}_log.csv"), report_steps, step=True,
        potentialEnergy=True, temperature=True))
    print(f"production {production_ns} ns ...")
    sim.step(int(production_ns * steps_per_ns))
    print(f"trajectory written to {out / f'{stem}_traj.pdb'}")


def enhance_ensemble(ensemble_pdb: str, out_dir: str, per_conformer_ps: float,
                     temperature: float):
    """Short MD from each conformation of a sampled ensemble, then merge
    (reference enhance_sampling_pdb, simulate.py:464-504)."""
    require_openmm()
    import tempfile
    from str2str_tpu.io import pdb as pdb_io

    with tempfile.TemporaryDirectory() as tmp:
        models = pdb_io.split_pdbfile(ensemble_pdb, tmp)
        outs = []
        for i, m in enumerate(models):
            d = Path(tmp) / f"md_{i}"
            run_md(m, str(d), temperature,
                   production_ns=per_conformer_ps / 1000.0,
                   equil_ns=0.01, implicit_solvent=True)
            outs.append(str(d / f"{Path(m).stem}_traj.pdb"))
        merged = Path(out_dir) / (Path(ensemble_pdb).stem + "_enhanced.pdb")
        pdb_io.merge_pdbfiles(outs, str(merged))
        print(f"wrote {merged}")


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    g = ap.add_mutually_exclusive_group(required=True)
    g.add_argument("--pdb", help="single structure to simulate")
    g.add_argument("--enhance", help="sampled ensemble to enhance with short MD")
    ap.add_argument("--output-dir", required=True)
    ap.add_argument("--temperature", type=float, default=None)
    ap.add_argument("--production-ns", type=float, default=None,
                    help="production length; default 100 ns, or "
                         "--desres-fraction of the published duration")
    ap.add_argument("--desres-fraction", type=float, default=None,
                    help="run this fraction of the target's published "
                         "DESRES aggregate time (e.g. 1e-4 of 106 us)")
    ap.add_argument("--per-conformer-ps", type=float, default=100.0)
    ap.add_argument("--implicit-solvent", action="store_true")
    args = ap.parse_args(argv)

    target = Path(args.pdb or args.enhance).stem
    temp = args.temperature or DESRES_TEMPERATURES.get(target, 300.0)
    if args.production_ns is None:
        if args.desres_fraction and target in DESRES_SIMULATION_TIME_US:
            args.production_ns = (DESRES_SIMULATION_TIME_US[target]
                                  * 1000.0 * args.desres_fraction)
        else:
            args.production_ns = 100.0
    if target in DESRES_SIMULATION_TIME_US:
        print(f"[{target}] DESRES reference: "
              f"{DESRES_SIMULATION_TIME_US[target]} us at "
              f"{DESRES_TEMPERATURES[target]} K; running "
              f"{args.production_ns} ns at {temp} K")
    if args.pdb:
        run_md(args.pdb, args.output_dir, temp, args.production_ns,
               implicit_solvent=args.implicit_solvent)
    else:
        enhance_ensemble(args.enhance, args.output_dir,
                         args.per_conformer_ps, temp)


if __name__ == "__main__":
    main()
