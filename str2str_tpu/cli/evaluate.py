"""Evaluation CLI: sample (optionally) then score ensembles against MD
reference trajectories.

Equivalent of the reference `python src/eval.py` end-to-end mode
(eval.py:47-161): per-target clash/bond validity + JS(PwD/TICA/Rg) against
the reference ensembles, TICA scatter PNG per target, tab-separated metrics
CSV with a mean row.

Usage:
    python -m str2str_tpu.cli.evaluate pred_dir=outputs/samples/all_delta \
        target_dir=/path/to/md_ensembles
    (omit pred_dir to sample first via the sampling CLI)
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

from ..config.core import load_config, parse_cli
from ..evaluation import metrics as M
from ..io import pdb as pdb_io
from ..utils.logging import get_logger

log = get_logger(__name__)

METRIC_COLUMNS = ["val_clash", "val_bond", "js_pwd", "js_tica", "js_rg"]


def plot_tics(tics: dict, save_to: str, ref_key: str = "target",
              n_max_point: int = 1000):
    """Per-ensemble TICA scatter panels, colored by Gaussian-KDE density with
    axes framed by the reference ensemble (reference scatterplot_2d,
    plot_utils.py:16-100; mako-style colormap, shared xy limits + margin)."""
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        from scipy.stats import gaussian_kde
    except Exception:
        return
    frame = tics.get(ref_key, next(iter(tics.values())))
    x_min, x_max = float(frame[:, 0].min()), float(frame[:, 0].max())
    y_min, y_max = float(frame[:, 1].min()), float(frame[:, 1].max())
    x_min -= (x_max - x_min) / 5.0
    x_max += (x_max - x_min) / 5.0
    y_min -= (y_max - y_min) / 5.0
    y_max += (y_max - y_min) / 5.0

    n = len(tics)
    fig, axes = plt.subplots(1, n, figsize=(6 * n, 6), squeeze=False)
    rng = np.random.RandomState(0)
    for ax, (name, xy) in zip(axes[0], tics.items()):
        if name != ref_key and xy.shape[0] > n_max_point:
            xy = xy[rng.choice(xy.shape[0], n_max_point, replace=False)]
        if xy.shape[0] < xy.shape[1]:
            density = np.full(xy.shape[0], 1.0 / max(xy.shape[0], 1))
        else:
            try:
                density = gaussian_kde(xy.T)(xy.T)
            except np.linalg.LinAlgError:  # degenerate ensemble
                density = np.full(xy.shape[0], 1.0 / max(xy.shape[0], 1))
        ax.scatter(xy[:, 0], xy[:, 1], s=10, alpha=0.7, c=density,
                   cmap="viridis_r", vmin=-0.05, vmax=0.40)
        ax.set_xlim(x_min, x_max)
        ax.set_ylim(y_min, y_max)
        ax.set_xlabel("tIC1", fontsize=14)
        ax.set_ylabel("tIC2", fontsize=14)
        ax.set_title(name, fontsize=14)
    fig.tight_layout()
    fig.savefig(save_to, dpi=150)
    plt.close(fig)


def evaluate_prediction(pred_dir: str, target_dir: str, output_dir: str,
                        tag: str = "eval") -> str:
    """Score every <code>.pdb in pred_dir against <code>*.pdb in target_dir
    (reference eval.py:47-99)."""
    pred_dir, target_dir = Path(pred_dir), Path(target_dir)
    out_dir = Path(output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    rows = []
    for pred_path in sorted(pred_dir.glob("*.pdb")):
        code = pred_path.stem
        cands = (list(target_dir.glob(f"{code}.pdb"))
                 + list(target_dir.glob(f"{code}*.pdb"))
                 + list(target_dir.glob(f"**/{code}*.pdb")))
        if not cands:
            log.warning(f"[{code}] no reference ensemble in {target_dir}; skipping")
            continue
        ens = pdb_io.load_ensembles_ca(str(pred_path), str(cands[0]))
        res = M.evaluate_ensembles(ens)
        tics = res.pop("_tics")
        plot_tics(tics, str(out_dir / f"tica_{code}.png"))
        row = {"target": code}
        row.update({c: res[c]["sample"] for c in METRIC_COLUMNS})
        rows.append(row)
        log.info(f"[{code}] " + " ".join(f"{c}={row[c]:.4f}" for c in METRIC_COLUMNS))

    if rows:
        mean_row = {"target": "MEAN"}
        for c in METRIC_COLUMNS:
            mean_row[c] = float(np.mean([r[c] for r in rows]))
        rows.append(mean_row)

    ts = time.strftime("%Y%m%d_%H%M%S")
    csv_path = out_dir / f"metrics_{tag}_{ts}.csv"
    with open(csv_path, "w") as f:
        f.write("\t".join(["target"] + METRIC_COLUMNS) + "\n")
        for r in rows:
            f.write("\t".join([str(r["target"])]
                              + [f"{r[c]:.4f}" for c in METRIC_COLUMNS]) + "\n")
    log.info(f"metrics written to {csv_path}")
    return str(csv_path)


def main(argv=None):
    name, overrides = parse_cli(argv if argv is not None else sys.argv[1:])
    cfg = load_config(name or "eval", overrides)

    pred_dir = cfg.get("pred_dir")
    if not pred_dir:
        from .sample import run as run_sampling
        pred_dir = run_sampling(cfg)

    target_dir = cfg.get("target_dir")
    if not target_dir:
        log.warning("no target_dir given; skipping metric evaluation")
        return None
    out_dir = Path(str(cfg.paths.output_dir)) / "eval"
    return evaluate_prediction(str(pred_dir), str(target_dir), str(out_dir),
                               tag="_".join(cfg.get("tags", ["eval"])))


if __name__ == "__main__":
    main()
